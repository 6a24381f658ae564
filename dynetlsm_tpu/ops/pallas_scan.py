"""Fused Pallas kernel for the exact sequential latent-position node scan.

The exact single-site sampler requires 2n dependent Metropolis steps per
sweep (mcmc/latent.py).  Executed as an XLA ``fori_loop``, each step is a
chain of small kernels whose dispatch dominates wall-clock at large n
(~9.5 us/step at T=10, n=500).  This kernel runs the entire scan inside one
Pallas program: the position field stays in VMEM across all 2n steps, node
gathers/scatters are one-hot lane operations, and the only HBM traffic is
one read of Y and the noise plus one write of the results.

The kernel carries an explicit chain axis (C): vmapped Pallas grids execute
*sequentially* on a TPU core, so batching chains inside the kernel is what
recovers cross-chain vector parallelism.  Chains beyond the VMEM budget are
processed in ``lax.map`` chunks.

Layout (round-2 rework): the feature axis d is **unrolled** — every tensor
is a (C, T, n) tile per feature component with the node axis on lanes and
time on sublanes, instead of round 1's (C, T, d, n).  With d=2 the old
layout used 2 of 8 sublanes of every (d, n) tile (25% VPU utilisation) and
padded each per-chain buffer 4x; (T, n) tiles at T=10 use 10 of 16 rows.
Adjacency rows are consumed through a per-32-node block load (int8 sublane
alignment) with *statically unrolled* row slices, replacing the per-step
(T, 32, n) mask-reduction.  Two kernel variants share this structure
(dispatch in _use_fullT): for T > 8 the phase-split layout (even/odd time
halves, HBM-streamed adjacency); for T <= 8 the full-T layout
(VMEM-resident adjacency, phase-1 reuse of phase 0's accepted
log-likelihood row).

Both the undirected and the **directed social-radii** likelihoods are
supported (reference directed_likelihoods_fast.pyx:46-80): the directed
variant feeds the transposed adjacency through a second row-block stage for
the in-edge terms and carries the radii as an extra lane row of the params
tile.  LSM random-walk and mixture priors both supported.  With an injected
proposal stream the kernel realises the *identical* Markov chain as
mcmc.latent.xla_exact_scan (parity tests in tests/test_pallas_scan.py).
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_PAD_POS = 1.0e4

# test hook: force the stream16 large-n adjacency layout at any shape
# (see node_scan_batch) so its parity vs the XLA scan can be checked at
# CPU-interpretable sizes
_FORCE_STREAM16 = False


def _fullT_adj_bytes(T, n_pad, directed):
    """VMEM footprint of the full-T variant's resident int8 adjacency plus
    its f32 32-row block stage.  Directed costs the same as undirected:
    Y and Y^T travel packed in one int8 tensor (Y + 2*Y^T)."""
    del directed
    return T * n_pad * n_pad + 32 * n_pad * 8 * 4


def _use_fullT(T, n_pad, directed=False):
    """Whether the full-T (VMEM-resident adjacency) kernel variant should
    serve this shape.

    For T <= 8 both time halves of the phase-split layout pad to 8
    sublanes, doubling every tile's compute versus one 8-padded full-T
    buffer — so small-T shapes (the shipped real datasets: T = 3..6) keep
    the original layout as long as the int8 adjacency (plus its f32 block
    stage) affordably fits VMEM.
    """
    return T <= 8 and _fullT_adj_bytes(T, n_pad, directed) < 8 * 2 ** 20


def _vmem_max_chains(T, n_pad, directed=False, clamp=True, stream16=False):
    """How many chains fit one kernel invocation (``clamp=False`` returns
    the raw capacity, which is 0 when not even one chain fits — the
    dispatch gate uses that to fall back to the XLA scan).

    Phase-split variant: the adjacency is streamed from HBM, so the fixed
    VMEM cost is only the double-buffered int8 block scratch plus the f32
    stage per adjacency tensor (2 tensors per parity pair when directed).
    ``stream16=True`` prices the large-n variant instead: single-buffered
    16-row bf16 blocks with no f32 stage (see _call_kernel), trading 2x
    adjacency HBM traffic (bf16 vs int8) for a ~4x smaller fixed footprint
    — the variant that serves n past the int8 layout's cap.
    Full-T variant (T <= 8): the int8 adjacency is VMEM-resident.  Per
    chain both variants carry ~16 live (C, ·, n) f32 buffers plus a
    ~128 KB fixed stack/spill cost — a two-point fit of the compiler's
    scoped-vmem accounting (T=10/n_pad=512 -> 649 KB/chain;
    T=3/n_pad=128 -> 254 KB/chain).
    """
    if _use_fullT(T, n_pad, directed):
        t_pad = 8
        y_bytes = _fullT_adj_bytes(T, n_pad, directed)
        per_chain = 16 * t_pad * n_pad * 4 + (1 << 17)
        raw = int((15.0 * 2 ** 20 - y_bytes) // per_chain)
    else:
        th = -(-T // 2)
        t_pad = 2 * (-(-th // 8) * 8)
        if stream16:
            # single-buffered (1, th, 16, n) bf16 block per parity, rows
            # consumed by static 16-way unroll — no stage buffers at all
            y_bytes = 2 * th * 16 * n_pad * 2
        else:
            # double-buffered int8 row blocks (outer dims unpadded: the
            # (32, n) trailing tile is already aligned) + the 8-row f32
            # stage; one packed stream pair whether directed or not
            y_bytes = 2 * (2 * th * 32 * n_pad
                           + th * 8 * n_pad * 4)
        # per-chain double-buffered stream tile scratch: (8d + 8) (th, 128)
        # f32 tiles at d = 2
        scr = 24 * th * 128 * 4
        # with the invariant streams HBM-streamed and the position field
        # aliased in place (input_output_aliases), the VMEM-resident
        # per-chain state is x/acc plus compiler temporaries: ~8 t_pad-row
        # buffer equivalents time-major; the directed twin eta_in/eta_out
        # evaluations keep ~24 equivalents live (calibrated: directed
        # n = 8192 int8 is rejected by the compiler needing 20.48M scoped
        # VMEM against the 16M limit, which backs out 24 equivalents, and
        # stream16 at the same shape compiles — so the dispatch must route
        # directed n = 8192 to stream16; undirected n = 16384 single-chain
        # compiles via stream16, directed n = 16384 fits neither)
        n_buf = 24 if directed else 8
        per_chain = n_buf * t_pad * n_pad * 4 + scr + (1 << 17)
        raw = int((15.0 * 2 ** 20 - y_bytes) // per_chain)
        if raw >= 8:
            # >= 8 chains routes to the chain-major layout (_call_kernel),
            # whose buffers carry no time-axis sublane padding (~8 real
            # time-row buffer equivalents per chain with in-place x).  With
            # the round-4 packed adjacency and hoisted-reciprocal eta rows
            # the directed kernel's live set matches the undirected one.
            # Fixed cost calibrated on-chip (round 4, both variants at
            # T=10/n_pad=512): C=44 compiles, C=48 overflows scoped VMEM,
            # so the 1<<17 stack/spill constant caps the model at 42 there
            per_chain = 8 * 2 * th * n_pad * 4 + scr + (1 << 17)
            raw = int((15.0 * 2 ** 20 - y_bytes) // per_chain)
    if not clamp:
        return raw                 # 0 => not even one chain fits VMEM
    return max(1, raw)


def calibrated_max_chains(T, n_pad, directed, stream16, mixture):
    """Chain capacity of one kernel invocation: the analytic
    :func:`_vmem_max_chains` model seeds a compile-probe search whose
    result is persisted per shape (ops/vmem_probe.py) — the model's
    constants track the XLA compiler's scoped-vmem accounting, which can
    change under a compiler upgrade; the probe cannot.  Off-TPU (and with
    DYNETLSM_VMEM_PROBE=0) the analytic value is used directly.  Returns
    the raw capacity (0 = the kernel does not fit at all)."""
    guess = max(_vmem_max_chains(T, n_pad, directed, clamp=False,
                                 stream16=stream16), 0)
    if jax.default_backend() != 'tpu':
        return guess
    from .vmem_probe import probed_max_chains
    return probed_max_chains(T, n_pad, directed, stream16, mixture, guess)


def _node_scan_kernel(params_ref, xE_ref, xO_ref, yE_ref, yO_ref, *refs,
                      mixture, directed, n_real, T_total, c_sublane=False,
                      stream16=False):
    """Phase-split layout: every per-time tensor is stored as an (even
    times, odd times) pair of (·, C, Th, n) buffers, Th = ceil(T/2).

    Phase 0 of the chromatic scan only touches even time rows and phase 1
    only odd rows, so the full-T formulation computed (and masked away)
    half of every tile; the split halves all phase-local work and drops the
    ``in_phase`` mask.  Temporal-prior neighbours cross parities: for even
    rows prev = shift_down(odd), next = odd; for odd rows prev = even,
    next = shift_up(even).  Bit-exact with the full-T kernel (the per-row
    lane reductions and scalar ops are unchanged).

    params: (C, 8, n) lane rows [b_in|b, b_out, tau_sq, sigma_sq, lmbda,
    radii] (pre-broadcast; scalar rows lane-constant, radii lane-varying).
    xE/xO : (d, C, Th, n).  The scan-invariant per-node streams live in
    HBM, lane-blocked with G = n/128: epsE/epsO, muzE/muzO
    (G, d, C, Th, 128) and uE/O, sigzE/O (G, C, Th, 128); each 128-node
    tile is DMA'd into a double-buffered VMEM scratch one tile ahead of
    the scan.  epsE holds phase 0's even rows and epsO phase 1's odd rows
    (the other parities of each phase's stream are never consumed) and is
    pre-multiplied by the step size.  yE/yO : (Th, n32, n) int8, also
    HBM-streamed; directed rows arrive packed as Y + 2*Y^T and are decoded
    per row.  Outputs: xE/xO (d, C, Th, n), accE/accO (C, Th, n) —
    interleaved back to (T, ...) by the caller.

    ``c_sublane=True`` selects the chain-major layout (round-3 rework):
    every (C, Th, n) buffer becomes (Th, C, n) (and params (8, C, n)), so
    the *chain* axis sits on sublanes.  With C a multiple of 8 the tiles
    have no sublane padding at all — the time-major layout pads Th to 8
    rows, wasting 37.5% of every vector op at the north-star T=10 (Th=5)
    and more at smaller T.  Mathematically identical (the lane axis and
    every reduction are unchanged); the caller picks the layout by C.
    """
    if stream16:
        # large-n layout: no f32 stage buffers — bf16 rows are sliced
        # (statically) straight out of the single-buffered block scratch
        (epsE_ref, epsO_ref, uE_ref, uO_ref,
         muzE_ref, muzO_ref, sigzE_ref, sigzO_ref,
         xE_out_ref, xO_out_ref, accE_out_ref, accO_out_ref,
         blkE_ref, blkO_ref, sem_ref,
         epsE_scr, epsO_scr, uE_scr, uO_scr,
         muzE_scr, muzO_scr, sigzE_scr, sigzO_scr, sem2_ref) = refs
        stageE_ref = stageO_ref = None
    else:
        (epsE_ref, epsO_ref, uE_ref, uO_ref,
         muzE_ref, muzO_ref, sigzE_ref, sigzO_ref,
         xE_out_ref, xO_out_ref, accE_out_ref, accO_out_ref,
         blkE_ref, blkO_ref, stageE_ref, stageO_ref, sem_ref,
         epsE_scr, epsO_scr, uE_scr, uO_scr,
         muzE_scr, muzO_scr, sigzE_scr, sigzO_scr, sem2_ref) = refs

    if c_sublane:
        d, Th, C, n = xE_ref.shape
    else:
        d, C, Th, n = xE_ref.shape
    f32 = jnp.float32
    T = T_total

    params = params_ref[...]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, n), 2)  # (1, 1, n)
    onehot0 = (lane == 0).astype(f32)
    valid = (lane < n_real).astype(f32)                       # real lanes

    def scalar(row):
        # per-chain scalar, broadcastable against the layout's tiles:
        # params rows are lane-constant
        sel = (params[row:row + 1] if c_sublane
               else params[:, row:row + 1, :])
        return jnp.sum(sel * onehot0, axis=2, keepdims=True)

    if c_sublane:
        b_in = params[0:1]                                    # (1, C, n)
        if directed:
            radii = params[5:6]                               # (1, C, n)
            u_row = params[6:7]                               # b_in / r
            v_row = params[7:8]                               # b_out / r
    else:
        b_in = params[:, 0:1, :]                              # (C, 1, n)
        if directed:
            radii = params[:, 5:6, :]                         # (C, 1, n)
            u_row = params[:, 6:7, :]
            v_row = params[:, 7:8, :]
    tau_sq = scalar(2)
    sigma_sq = scalar(3)
    lmbda = scalar(4)
    # per-chain tempering scalar multiplying the network log-lik delta
    # (parallel tempering, reference sample_latent_positions.py:132-141
    # ratios scaled by the replica's beta).  Stored in a params row the
    # prior family leaves unused — tau_sq (row 2) under the mixture prior,
    # lmbda (row 4) under the random-walk prior — so the params tile stays
    # 8 sublanes.  1.0 when untempered (an exact multiply).
    temper_s = tau_sq if mixture else lmbda
    if directed:
        b_in_s = scalar(0)
        b_out_s = scalar(1)
        # keep b_both lane-resident like the undirected b_in row: the
        # scalar (C,1,1) form needs a sublane+lane double broadcast
        # against the (C,Th,n) dist, which Mosaic rejects ("Broadcast in
        # both sublanes and lanes") once n is large; the params rows are
        # exact lane-broadcasts of the same values, so this is bit-equal
        b_both = (params[0:1] + params[1:2] if c_sublane
                  else params[:, 0:1, :] + params[:, 1:2, :])

    t_ax = 0 if c_sublane else 1                             # time axis
    m_col = (jax.lax.broadcasted_iota(jnp.int32, (Th, 1, 1), 0)
             if c_sublane
             else jax.lax.broadcasted_iota(jnp.int32, (1, Th, 1), 1))
    # t == 0 lives on even row 0; t == T-1 on even row (T-1)//2 when T is
    # odd, else on odd row T//2 - 1
    first_mask = (m_col == 0)                                 # even half
    if T % 2 == 1:
        last_mask = ((m_col == (T - 1) // 2), (m_col < 0))
    else:
        last_mask = ((m_col < 0), (m_col == T // 2 - 1))

    # invariant per-node streams (eps pre-multiplied by step, u, muz, sigz)
    # arrive lane-blocked: (d*G, ·, ·, 128) / (G, ·, ·, 128) with G = n/128.
    # Each 32-node block hoists one 128-lane tile read per stream and every
    # node gathers from that tile with a 128-lane one-hot — 4x less
    # multiply-reduce work than the full-lane gathers at n = 512.
    G = n // 128
    lane128 = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 128), 2)

    def _trow(a, sl):
        # slice along the layout's time axis
        return a[sl] if c_sublane else a[:, sl]

    def shift_down(a):                                       # along Th
        return jnp.concatenate(
            [jnp.zeros_like(_trow(a, slice(0, 1))),
             _trow(a, slice(0, -1))], axis=t_ax)

    def shift_up(a, pad=0.0):
        return jnp.concatenate(
            [_trow(a, slice(1, None)),
             jnp.full_like(_trow(a, slice(0, 1)), pad)], axis=t_ax)

    def prior_terms(parity, xq, xj_oth, mu_j, mu_oth, sig_j, sig_oth):
        """Log-prior of candidate xq (list of d (C, Th, 1)) at this
        parity's rows, temporal neighbours from the node's other-parity
        trajectory xj_oth.  Returns (C, Th, 1)."""
        last = last_mask[parity]
        back = 0.0
        fwd = 0.0
        if mixture:
            # sig at t+1: even rows -> odd sig; odd rows -> next even sig
            sig_nxt = sig_oth if parity == 0 else shift_up(sig_oth, 1.0)
            for di in range(d):
                prev = shift_down(xj_oth[di]) if parity == 0 else xj_oth[di]
                nxt = xj_oth[di] if parity == 0 else shift_up(xj_oth[di])
                mu_nxt = mu_oth[di] if parity == 0 \
                    else shift_up(mu_oth[di])
                difft = xq[di] - (1.0 - lmbda) * prev - lmbda * mu_j[di]
                if parity == 0:
                    diff0 = xq[di] - mu_j[di]
                    difft = jnp.where(first_mask, diff0, difft)
                back = back + difft * difft
                fdiff = nxt - (1.0 - lmbda) * xq[di] - lmbda * mu_nxt
                fwd = fwd + fdiff * fdiff
            back = -0.5 * back / sig_j
            fwd = -0.5 * fwd / sig_nxt
        else:
            bt = 0.0
            b0 = 0.0
            for di in range(d):
                prev = shift_down(xj_oth[di]) if parity == 0 else xj_oth[di]
                nxt = xj_oth[di] if parity == 0 else shift_up(xj_oth[di])
                b0 = b0 + xq[di] * xq[di]
                bt = bt + (xq[di] - prev) ** 2
                fwd = fwd + (nxt - xq[di]) ** 2
            back = -0.5 * bt / sigma_sq
            if parity == 0:
                back = jnp.where(first_mask, -0.5 * b0 / tau_sq, back)
            fwd = -0.5 * fwd / sigma_sq
        fwd = jnp.where(last, 0.0, fwd)
        return back + fwd                                    # (C, Th, 1)

    def loglik_row(x, xq, y_row, yt_row, p_out, p_in, mask):
        """Sum over partners of the Bernoulli terms at candidate xq (list of
        d (C, Th, 1)); x the parity's field (list of d (C, Th, n)).  Returns
        (C, Th, 1)."""
        d2 = 0.0
        for di in range(d):
            diff = x[di] - xq[di]                            # (C, Th, n)
            d2 = d2 + diff * diff
        dist = jnp.sqrt(jnp.maximum(d2, 0.0))
        if directed:
            # reference directed_likelihoods_fast.pyx:46-80 in
            # hoisted-reciprocal form: eta for j -> partner =
            # b_in (1 - d/r_partner) + b_out (1 - d/r_j)
            # = (b_in + b_out) - d * (b_in/r_partner + b_out/r_j); the
            # reciprocal rows p_out/p_in are per node step, so each eval
            # pays one mult instead of two divides per eta (op-for-op the
            # same sequence as mcmc.latent._partial_loglik_terms)
            eta_out = b_both - dist * p_out
            eta_in = b_both - dist * p_in
            ll = y_row * eta_out - jax.nn.softplus(eta_out)
            ll += yt_row * eta_in - jax.nn.softplus(eta_in)
        else:
            eta = b_in - dist                                # (C, Th, n)
            ll = y_row * eta - jax.nn.softplus(eta)
        return jnp.sum(ll * mask, axis=2, keepdims=True)

    def node_step(j, jl, streams, y_rows, yt_rows, xs, accs):
        """One node's two-phase MH update.  y_rows/yt_rows: per-parity
        (1, Th, n) f32; streams: per-block 128-lane stream tiles;
        jl = j's lane inside the block; xs/accs: per-parity field lists."""
        onehot = (lane == j).astype(f32)                     # (1, 1, n)
        mask = (1.0 - onehot) * valid
        oh128 = (lane128 == jl).astype(f32)                  # (1, 1, 128)
        eps_blk, u_blk, muz_blk, sigz_blk = streams

        def gather(a):                                     # (C,Th,n)->(C,Th,1)
            return jnp.sum(a * onehot, axis=2, keepdims=True)

        def g128(tile):                              # (·, ·, 128) -> (·, ·, 1)
            return jnp.sum(tile * oh128, axis=2, keepdims=True)

        if directed:
            r_self = gather(radii)                           # (C, 1, 1)
            p_out = u_row + b_out_s / r_self                 # (·, ·, n)
            p_in = v_row + b_in_s / r_self
        else:
            p_out = p_in = None
        if mixture:
            mu_j = [[g128(muz_blk[p][di]) for di in range(d)]
                    for p in (0, 1)]
            sig_j = [g128(sigz_blk[p]) for p in (0, 1)]
        else:
            mu_j = sig_j = (None, None)

        # phase 0 gathers both parities of node j's trajectory; phase 1
        # reuses them from registers (phase 0's accepted even values are
        # exactly what a re-gather after its scatter would return)
        xj_even = [gather(xs[0][di]) for di in range(d)]
        xj_odd = [gather(xs[1][di]) for di in range(d)]
        for parity in (0, 1):
            x_self = xs[parity]
            xj = xj_even if parity == 0 else xj_odd
            xj_oth = xj_odd if parity == 0 else xj_even
            eps_j = [g128(eps_blk[parity][di]) for di in range(d)]
            u_j = g128(u_blk[parity])
            # step is pre-multiplied into eps by the caller
            x_prop = [xj[di] + eps_j[di] for di in range(d)]

            ll_prop = loglik_row(x_self, x_prop, y_rows[parity],
                                 yt_rows[parity], p_out, p_in, mask)
            ll_cur = loglik_row(x_self, xj, y_rows[parity],
                                yt_rows[parity], p_out, p_in, mask)
            mu_oth = mu_j[1 - parity] if mixture else None
            ratio = (temper_s * (ll_prop - ll_cur)
                     + prior_terms(parity, x_prop, xj_oth, mu_j[parity],
                                   mu_oth, sig_j[parity], sig_j[1 - parity])
                     - prior_terms(parity, xj, xj_oth, mu_j[parity],
                                   mu_oth, sig_j[parity], sig_j[1 - parity]))
            accept = u_j < ratio                             # (C, Th, 1)
            for di in range(d):
                x_new = jnp.where(accept, x_prop[di], xj[di])
                x_self[di] = (x_self[di] * (1.0 - onehot) + x_new * onehot)
                xj[di] = x_new          # phase 1's even neighbours
            accs[parity] = accs[parity] + accept.astype(f32) * onehot
        return xs, accs

    xE0 = [xE_ref[di] for di in range(d)]
    xO0 = [xO_ref[di] for di in range(d)]
    acc_shape = (Th, C, n) if c_sublane else (C, Th, n)
    accE0 = jnp.zeros(acc_shape, f32)
    accO0 = jnp.zeros(acc_shape, f32)
    n32 = yE_ref.shape[1]
    n_blocks = n32 // (16 if stream16 else 32)

    # Adjacency row supply (streamed): the int8 adjacency stays in HBM and
    # 32-node row blocks are DMA'd into a double-buffered VMEM scratch one
    # block ahead of the scan (the per-block compute of 32 node steps dwarfs
    # the ~us copy, so the stream is fully hidden).  This removes the
    # T x n^2 VMEM residency that previously capped the kernel at n ~ 700
    # (PLAN round-2 item b); the limit is now the (C, Th, n) position/noise
    # buffers (~n 8000 single-chain).  Within a block, rows come in three
    # levels — convert the int8 block to an f32 stage (sublane-aligned),
    # take 8-row ref subslices, and statically unroll the final 8 rows
    # (full 32-way unrolling explodes mosaic compile time; value-level
    # dynamic_slice is unsupported).  Directed rows arrive PACKED
    # (Y + 2*Y^T) and are decoded per row at the node step — one stream
    # pair instead of round 3's four.
    #
    # stream16 (large-n) variant: the adjacency arrives bf16 and 16-row
    # blocks (the bf16 sublane-alignment quantum) are DMA'd into a
    # SINGLE-buffered scratch, rows statically sliced out per node step —
    # no int8 stage buffers at all.  At the n this variant serves
    # (> ~8000) a block's 16 node steps cost ~100 us of vector work versus
    # ~1 us for its copy, so losing the copy/compute overlap is noise,
    # and the freed VMEM is what lets the position field fit at n = 16384.
    hbm_refs = (yE_ref, yO_ref)
    dbufs = (blkE_ref, blkO_ref)
    rows_blk = 16 if stream16 else 32

    def dma(i, slot, b):
        return pltpu.make_async_copy(
            hbm_refs[i].at[:, pl.ds(b * rows_blk, rows_blk), :],
            dbufs[i].at[slot], sem_ref.at[i, slot])

    for i in range(len(hbm_refs)):
        dma(i, 0, 0).start()

    # Invariant per-node stream supply: (G, ·, s0, s1, 128) HBM arrays,
    # one 128-node tile DMA'd per stream into a double-buffered scratch
    # one tile (= 4 adjacency blocks) ahead.  muz/sigz carry dummy zeros
    # when not a mixture — their copies are skipped.
    stream_hbm = (epsE_ref, epsO_ref, uE_ref, uO_ref)
    stream_scr = (epsE_scr, epsO_scr, uE_scr, uO_scr)
    if mixture:
        stream_hbm += (muzE_ref, muzO_ref, sigzE_ref, sigzO_ref)
        stream_scr += (muzE_scr, muzO_scr, sigzE_scr, sigzO_scr)

    def dma2(s, slot, g):
        return pltpu.make_async_copy(
            stream_hbm[s].at[g], stream_scr[s].at[slot], sem2_ref.at[s, slot])

    for s in range(len(stream_hbm)):
        dma2(s, 0, 0).start()

    def block_body(b, carry):
        j0 = b * 32
        slot = jax.lax.rem(b, 2)

        @pl.when(b + 1 < n_blocks)
        def _():
            for i in range(len(hbm_refs)):
                dma(i, 1 - slot, b + 1).start()

        for i in range(len(hbm_refs)):
            dma(i, slot, b).wait()

        stages = (stageE_ref, stageO_ref)

        # stream tile bookkeeping: g advances every 4 blocks.  At each g
        # boundary wait for tile g's copies (started 4 blocks earlier, or
        # before the loop for g = 0) and prefetch tile g + 1 into the
        # other slot — whose previous tenant (tile g - 1) was last read in
        # the preceding block.
        g = b // 4
        jl0 = j0 - g * 128
        slot2 = jax.lax.rem(g, 2)

        @pl.when(jax.lax.rem(b, 4) == 0)
        def _():
            for s in range(len(stream_hbm)):
                dma2(s, slot2, g).wait()

        @pl.when(jnp.logical_and(jax.lax.rem(b, 4) == 0, g + 1 < G))
        def _():
            for s in range(len(stream_hbm)):
                dma2(s, 1 - slot2, g + 1).start()

        def blkd(scr):                  # (2, d, ·, ·, 128) -> d tiles
            return [scr[slot2, di] for di in range(d)]

        eps_blk = (blkd(epsE_scr), blkd(epsO_scr))
        u_blk = (uE_scr[slot2], uO_scr[slot2])
        if mixture:
            muz_blk = (blkd(muzE_scr), blkd(muzO_scr))
            sigz_blk = (sigzE_scr[slot2], sigzO_scr[slot2])
        else:
            muz_blk = sigz_blk = None
        streams = (eps_blk, u_blk, muz_blk, sigz_blk)

        def sub_body(m, carry):
            xs, accs = carry
            # stage only the 8 rows this sub-block consumes: the f32 stage
            # buffer is (Th, 8, n) instead of (Th, 32, n), saving
            # 3 * Th * n * 96 B of fixed VMEM — the margin that lets the
            # kernel serve n ~ 4000+ (the int8 -> f32 convert work is
            # unchanged, just split across the four sub-blocks)
            for i in range(len(hbm_refs)):
                stages[i][...] = dbufs[i][slot, :,
                                          pl.ds(m * 8, 8), :].astype(f32)
            subE = stageE_ref[...]                           # (Th, 8, n)
            subO = stageO_ref[...]
            def row(sub):
                # adjacency row broadcastable over the chain axis: (1, Th, n)
                # time-major, (Th, 1, n) chain-major
                r = sub[:, k, :]
                return r[:, None, :] if c_sublane else r[None]

            for k in range(8):                               # static unroll
                rE, rO = row(subE), row(subO)
                if directed:
                    # decode the packed row: p = y + 2*yt, y/yt in {0, 1}
                    ytE = jnp.floor(rE * 0.5)
                    ytO = jnp.floor(rO * 0.5)
                    y_rows = (rE - 2.0 * ytE, rO - 2.0 * ytO)
                    yt_rows = (ytE, ytO)
                else:
                    y_rows = (rE, rO)
                    yt_rows = (None, None)
                xs, accs = node_step(j0 + m * 8 + k, jl0 + m * 8 + k,
                                     streams, y_rows, yt_rows, xs, accs)
            return xs, accs

        return jax.lax.fori_loop(0, 4, sub_body, carry)

    def block_body16(b, carry):
        """stream16 variant: 16 bf16 rows per block, single-buffered (the
        next block's copy starts only after this block consumed its rows),
        statically unrolled — same node_step, same maths."""
        j0 = b * 16
        for i in range(len(hbm_refs)):
            dma(i, 0, b).wait()

        # stream tile bookkeeping: one 128-node tile spans 8 16-row blocks
        g = b // 8
        jl0 = j0 - g * 128
        slot2 = jax.lax.rem(g, 2)

        @pl.when(jax.lax.rem(b, 8) == 0)
        def _():
            for s in range(len(stream_hbm)):
                dma2(s, slot2, g).wait()

        @pl.when(jnp.logical_and(jax.lax.rem(b, 8) == 0, g + 1 < G))
        def _():
            for s in range(len(stream_hbm)):
                dma2(s, 1 - slot2, g + 1).start()

        def blkd(scr):                  # (2, d, ·, ·, 128) -> d tiles
            return [scr[slot2, di] for di in range(d)]

        eps_blk = (blkd(epsE_scr), blkd(epsO_scr))
        u_blk = (uE_scr[slot2], uO_scr[slot2])
        if mixture:
            muz_blk = (blkd(muzE_scr), blkd(muzO_scr))
            sigz_blk = (sigzE_scr[slot2], sigzO_scr[slot2])
        else:
            muz_blk = sigz_blk = None
        streams = (eps_blk, u_blk, muz_blk, sigz_blk)

        xs, accs = carry

        def row16(i, k):
            # static sublane slice straight off the bf16 block ref (one
            # (Th, n) row live at a time), converted at use
            r = dbufs[i][0, :, k, :].astype(f32)         # (Th, n)
            return r[:, None, :] if c_sublane else r[None]

        for k in range(16):                              # static unroll
            rE, rO = row16(0, k), row16(1, k)
            if directed:
                # decode the packed row: p = y + 2*yt, y/yt in {0, 1}
                ytE = jnp.floor(rE * 0.5)
                ytO = jnp.floor(rO * 0.5)
                y_rows = (rE - 2.0 * ytE, rO - 2.0 * ytO)
                yt_rows = (ytE, ytO)
            else:
                y_rows = (rE, rO)
                yt_rows = (None, None)
            xs, accs = node_step(j0 + k, jl0 + k, streams,
                                 y_rows, yt_rows, xs, accs)

        # single buffer: the prefetch of block b+1 may only begin after
        # this block's 16 rows were read out above
        @pl.when(b + 1 < n_blocks)
        def _():
            for i in range(len(hbm_refs)):
                dma(i, 0, b + 1).start()
        return xs, accs

    # padded nodes (n_real <= j < n32) are no-ops: their step/eps/log_u are
    # zero-padded so x_prop == x_cur and log_u(=0) < ratio(=0) rejects
    (xE_fin, xO_fin), (accE_fin, accO_fin) = jax.lax.fori_loop(
        0, n_blocks, block_body16 if stream16 else block_body,
        ([xE0, xO0], [accE0, accO0]))
    for di in range(d):
        xE_out_ref[di] = xE_fin[di]
        xO_out_ref[di] = xO_fin[di]
    accE_out_ref[...] = accE_fin
    accO_out_ref[...] = accO_fin


def _node_scan_kernel_fullT(params_ref, x_ref, y_ref, *refs, mixture, directed,
                      n_real, c_sublane=False):
    """Full-T variant used when T <= 8 (see _use_fullT): one
    8-padded (C, T, n) buffer per tensor beats two 8-padded halves.
    Adjacency is VMEM-resident (small T keeps it affordable).

    params: (C, 8, n) lane rows
    [b_in|b, b_out, tau_sq, sigma_sq, lmbda, radii] (pre-broadcast; scalar
    rows are lane-constant, the radii row is lane-varying).

    x / eps0 / eps1 / muz : (d, C, T, n)   (d leading => static slices)
    y (+ yt when directed) : (T, n32, n) int8 (n32 = n padded to 32)
    step / u0 / u1 / sigz : (C, T, n)
    Outputs: x_out (d, C, T, n), acc (C, T, n).

    ``c_sublane=True``: chain-major layout — (C, T, n) buffers become
    (T, C, n) and params (8, C, n), eliminating the T -> 8 sublane padding
    (62% wasted vector work at T=3) once C >= 8.  Same maths, same lane
    axis (see _node_scan_kernel).
    """
    (step_ref, eps0_ref, eps1_ref, u0_ref, u1_ref, muz_ref,
     sigz_ref, x_out_ref, acc_out_ref, block_ref) = refs

    if c_sublane:
        d, T, C, n = x_ref.shape
    else:
        d, C, T, n = x_ref.shape
    f32 = jnp.float32

    params = params_ref[...]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, n), 2)  # (1, 1, n)
    onehot0 = (lane == 0).astype(f32)
    valid = (lane < n_real).astype(f32)                       # real lanes

    def scalar(row):
        # per-chain scalar, broadcastable against the layout's tiles:
        # params rows are lane-constant
        sel = (params[row:row + 1] if c_sublane
               else params[:, row:row + 1, :])
        return jnp.sum(sel * onehot0, axis=2, keepdims=True)

    if c_sublane:
        b_in = params[0:1]                                    # (1, C, n)
        if directed:
            radii = params[5:6]
            u_row = params[6:7]                               # b_in / r
            v_row = params[7:8]                               # b_out / r
    else:
        b_in = params[:, 0:1, :]                              # (C, 1, n)
        if directed:
            radii = params[:, 5:6, :]                         # (C, 1, n)
            u_row = params[:, 6:7, :]
            v_row = params[:, 7:8, :]
    tau_sq = scalar(2)
    sigma_sq = scalar(3)
    lmbda = scalar(4)
    # per-chain tempering scalar in the prior family's unused params row
    # (see _node_scan_kernel); 1.0 when untempered
    temper_s = tau_sq if mixture else lmbda
    if directed:
        b_in_s = scalar(0)
        b_out_s = scalar(1)
        # keep b_both lane-resident like the undirected b_in row: the
        # scalar (C,1,1) form needs a sublane+lane double broadcast
        # against the (C,Th,n) dist, which Mosaic rejects ("Broadcast in
        # both sublanes and lanes") once n is large; the params rows are
        # exact lane-broadcasts of the same values, so this is bit-equal
        b_both = (params[0:1] + params[1:2] if c_sublane
                  else params[:, 0:1, :] + params[:, 1:2, :])

    t_ax = 0 if c_sublane else 1                             # time axis
    t_col = (jax.lax.broadcasted_iota(jnp.int32, (T, 1, 1), 0)
             if c_sublane
             else jax.lax.broadcasted_iota(jnp.int32, (1, T, 1), 1))

    step = step_ref[...]
    eps_phase = (eps0_ref[...], eps1_ref[...])               # (d, C, T, n)
    u_phase = (u0_ref[...], u1_ref[...])                     # (C, T, n)
    if mixture:
        muz = muz_ref[...]                                   # (d, C, T, n)
        sigz = sigz_ref[...]                                 # (C, T, n)

    def _trow(a, sl):
        return a[sl] if c_sublane else a[:, sl]

    def shift_down(a):                                       # along T
        return jnp.concatenate(
            [jnp.zeros_like(_trow(a, slice(0, 1))),
             _trow(a, slice(0, -1))], axis=t_ax)

    def shift_up(a):
        return jnp.concatenate(
            [_trow(a, slice(1, None)),
             jnp.zeros_like(_trow(a, slice(0, 1)))], axis=t_ax)

    def prior_terms(xq, xj, mu_j, sig_j):
        """Log-prior of candidate xq given stale temporal neighbours from
        xj; all inputs lists of d (C, T, 1) (sig_j (C, T, 1)).  Returns
        (C, T, 1)."""
        back = 0.0
        fwd = 0.0
        if mixture:
            sig_nxt = jnp.concatenate(
                [_trow(sig_j, slice(1, None)),
                 jnp.ones_like(_trow(sig_j, slice(0, 1)))], axis=t_ax)
            for di in range(d):
                prev = shift_down(xj[di])
                nxt = shift_up(xj[di])
                mu_nxt = shift_up(mu_j[di])
                diff0 = xq[di] - mu_j[di]
                difft = xq[di] - (1.0 - lmbda) * prev - lmbda * mu_j[di]
                diff = jnp.where(t_col == 0, diff0, difft)
                back = back + diff * diff
                fdiff = nxt - (1.0 - lmbda) * xq[di] - lmbda * mu_nxt
                fwd = fwd + fdiff * fdiff
            back = -0.5 * back / sig_j
            fwd = -0.5 * fwd / sig_nxt
        else:
            b0 = 0.0
            bt = 0.0
            for di in range(d):
                prev = shift_down(xj[di])
                nxt = shift_up(xj[di])
                b0 = b0 + xq[di] * xq[di]
                bt = bt + (xq[di] - prev) ** 2
                fwd = fwd + (nxt - xq[di]) ** 2
            back = jnp.where(t_col == 0, -0.5 * b0 / tau_sq,
                             -0.5 * bt / sigma_sq)
            fwd = -0.5 * fwd / sigma_sq
        fwd = jnp.where(t_col == T - 1, 0.0, fwd)
        return back + fwd                                    # (C, T, 1)

    def loglik_row(x, xq, y_row, yt_row, p_out, p_in, mask):
        """Sum over partners of the Bernoulli terms at candidate xq (list of
        d (C, T, 1)); x the full field (list of d (C, T, n)).  Returns
        (C, T, 1)."""
        d2 = 0.0
        for di in range(d):
            diff = x[di] - xq[di]                            # (C, T, n)
            d2 = d2 + diff * diff
        dist = jnp.sqrt(jnp.maximum(d2, 0.0))
        if directed:
            # reference directed_likelihoods_fast.pyx:46-80 in
            # hoisted-reciprocal form (see _node_scan_kernel.loglik_row)
            eta_out = b_both - dist * p_out
            eta_in = b_both - dist * p_in
            ll = y_row * eta_out - jax.nn.softplus(eta_out)
            ll += yt_row * eta_in - jax.nn.softplus(eta_in)
        else:
            eta = b_in - dist                                # (C, T, n)
            ll = y_row * eta - jax.nn.softplus(eta)
        return jnp.sum(ll * mask, axis=2, keepdims=True)

    def node_step(j, y_row, yt_row, x, acc):
        """One node's two-phase MH update.  y_row/yt_row: (1, T, n) f32."""
        onehot = (lane == j).astype(f32)                     # (1, 1, n)
        mask = (1.0 - onehot) * valid

        def gather(a):                                       # (C,T,n)->(C,T,1)
            return jnp.sum(a * onehot, axis=2, keepdims=True)

        step_j = gather(step)
        if directed:
            r_self = gather(radii)                           # (C, 1, 1)
            p_out = u_row + b_out_s / r_self
            p_in = v_row + b_in_s / r_self
        else:
            p_out = p_in = None
        if mixture:
            mu_j = [gather(muz[di]) for di in range(d)]
            sig_j = gather(sigz)
        else:
            mu_j = sig_j = None

        ll_cur = None
        for phase in (0, 1):
            xj = [gather(x[di]) for di in range(d)]
            eps_j = [gather(eps_phase[phase][di]) for di in range(d)]
            u_j = gather(u_phase[phase])
            x_prop = [xj[di] + step_j * eps_j[di] for di in range(d)]

            ll_prop = loglik_row(x, x_prop, y_row, yt_row, p_out, p_in, mask)
            if ll_cur is None:
                ll_cur = loglik_row(x, xj, y_row, yt_row, p_out, p_in, mask)
            ratio = (temper_s * (ll_prop - ll_cur)
                     + prior_terms(x_prop, xj, mu_j, sig_j)
                     - prior_terms(xj, xj, mu_j, sig_j))     # (C, T, 1)
            in_phase = (t_col % 2) == phase
            accept = jnp.logical_and(u_j < ratio, in_phase)  # (C, T, 1)
            # phase 1 sees the same partner field at node j's row, so the
            # accepted candidate's row log-lik is next phase's current
            ll_cur = jnp.where(accept, ll_prop, ll_cur)
            for di in range(d):
                x_new = jnp.where(accept, x_prop[di], xj[di])
                x[di] = x[di] * (1.0 - onehot) + x_new * onehot
            acc = acc + accept.astype(f32) * onehot
        return x, acc

    x0 = [x_ref[di] for di in range(d)]
    acc0 = jnp.zeros((T, C, n) if c_sublane else (C, T, n), f32)
    n32 = y_ref.shape[1]

    # Adjacency row supply: int8 dynamic sublane slices must be 32-aligned,
    # so rows come in three levels — stage a 32-row block (aligned) into an
    # f32 VMEM scratch, take 8-row ref subslices (8-aligned, dynamic), and
    # statically unroll the final 8 rows.  Full 32-way unrolling explodes
    # mosaic compile time; value-level dynamic_slice is unsupported.
    def block_body(b, carry):
        j0 = b * 32
        block_ref[...] = y_ref[:, pl.ds(pl.multiple_of(j0, 32), 32),
                               :].astype(f32)

        def sub_body(m, carry):
            x, acc = carry
            sub = block_ref[:, pl.ds(m * 8, 8), :]           # (T, 8, n)
            def row(sb):
                # (1, T, n) time-major, (T, 1, n) chain-major
                r = sb[:, k, :]
                return r[:, None, :] if c_sublane else r[None]

            for k in range(8):                               # static unroll
                y_row = row(sub)
                if directed:
                    # decode the packed row: p = y + 2*yt (see node_scan_batch)
                    yt_row = jnp.floor(y_row * 0.5)
                    y_row = y_row - 2.0 * yt_row
                else:
                    yt_row = None
                x, acc = node_step(j0 + m * 8 + k, y_row, yt_row, x, acc)
            return x, acc

        return jax.lax.fori_loop(0, 4, sub_body, carry)

    # padded nodes (n_real <= j < n32) are no-ops: their step/eps/log_u are
    # zero-padded so x_prop == x_cur and log_u(=0) < ratio(=0) rejects
    x_fin, acc_fin = jax.lax.fori_loop(0, n32 // 32, block_body, (x0, acc0))
    for di in range(d):
        x_out_ref[di] = x_fin[di]
    acc_out_ref[...] = acc_fin


def _call_kernel_fullT(Y_p, chunk, *, mixture, directed, n_real, interpret):
    x_l, step_p, eps_l, u_l, muz, sigz, params = chunk
    d, C, T, n_pad = x_l.shape
    eps0, eps1 = eps_l[0], eps_l[1]
    u0, u1 = u_l[:, 0], u_l[:, 1]

    # chain-major layout once C >= 8 (see _node_scan_kernel): no T -> 8
    # sublane padding of any buffer
    c_sublane = C >= 8
    if c_sublane:
        x_l, eps0, eps1, muz = (jnp.transpose(a, (0, 2, 1, 3))
                                for a in (x_l, eps0, eps1, muz))
        step_p, u0, u1, sigz = (jnp.transpose(a, (1, 0, 2))
                                for a in (step_p, u0, u1, sigz))
        params = jnp.transpose(params, (1, 0, 2))            # (8, C, n)
        x_shape = (d, T, C, n_pad)
        a_shape = (T, C, n_pad)
    else:
        x_shape = (d, C, T, n_pad)
        a_shape = (C, T, n_pad)

    # directed Y_p arrives packed (Y + 2*Y^T): one adjacency operand and
    # one block stage either way
    scratch = [pltpu.VMEM((T, 32, n_pad), jnp.float32)]
    x_out, acc = pl.pallas_call(
        functools.partial(_node_scan_kernel_fullT, mixture=mixture,
                          directed=directed, n_real=n_real,
                          c_sublane=c_sublane),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 10,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct(x_shape, x_l.dtype),
                   jax.ShapeDtypeStruct(a_shape, x_l.dtype)),
        scratch_shapes=scratch,
        # the kernel reads x once (into the fori carry) before its final
        # write, so the position field updates in place — one VMEM buffer
        # instead of separate in/out copies per chain
        input_output_aliases={1: 0},
        interpret=interpret,
    )(params, x_l, Y_p, step_p, eps0, eps1, u0, u1, muz, sigz)
    if c_sublane:
        x_out = jnp.transpose(x_out, (0, 2, 1, 3))
        acc = jnp.transpose(acc, (1, 0, 2))
    return x_out, acc


def _split_parity(a, axis, T, Th):
    """Slice ``a`` into (even, odd) halves along the time ``axis``, padding
    the odd half to Th rows (zeros) when T is odd."""
    idx = [slice(None)] * a.ndim
    idx[axis] = slice(0, None, 2)
    even = a[tuple(idx)]
    idx[axis] = slice(1, None, 2)
    odd = a[tuple(idx)]
    if odd.shape[axis] < Th:
        widths = [(0, 0)] * a.ndim
        widths[axis] = (0, Th - odd.shape[axis])
        odd = jnp.pad(odd, widths)
    return even, odd


def _interleave_parity(even, odd, axis, T):
    """Inverse of :func:`_split_parity`."""
    stacked = jnp.stack([even, odd], axis=axis + 1)
    shape = list(even.shape)
    shape[axis] = even.shape[axis] * 2
    out = stacked.reshape(shape)
    idx = [slice(None)] * out.ndim
    idx[axis] = slice(0, T)
    return out[tuple(idx)]


def _call_kernel(Y_p, chunk, *, mixture, directed, n_real, interpret,
                 stream16=False):
    x_l, step_p, eps_l, u_l, muz, sigz, params = chunk
    d, C, T, n_pad = x_l.shape
    if _use_fullT(T, n_pad, directed):
        return _call_kernel_fullT(Y_p, chunk, mixture=mixture,
                                  directed=directed, n_real=n_real,
                                  interpret=interpret)
    Th = -(-T // 2)

    xE, xO = _split_parity(x_l, 2, T, Th)
    stepE, stepO = _split_parity(step_p, 1, T, Th)
    # each phase consumes only its own parity of its proposal stream; the
    # step size folds into the proposal offset here (the kernel gathers one
    # fewer stream per phase)
    epsE, _ = _split_parity(eps_l[0], 2, T, Th)
    _, epsO = _split_parity(eps_l[1], 2, T, Th)
    epsE = epsE * stepE[None]
    epsO = epsO * stepO[None]
    uE, _ = _split_parity(u_l[:, 0], 1, T, Th)
    _, uO = _split_parity(u_l[:, 1], 1, T, Th)
    muzE, muzO = _split_parity(muz, 2, T, Th)
    sigzE, sigzO = _split_parity(sigz, 1, T, Th)
    # odd-half sublane pads must keep sig away from 0 (divisor)
    if T % 2 == 1:
        sigzO = sigzO.at[:, Th - 1].set(1.0)

    # directed Y_p arrives packed (Y + 2*Y^T): one stream pair either way
    yE, yO = _split_parity(Y_p, 0, T, Th)
    adj = (yE, yO)

    # chain-major layout (chains on sublanes): no sublane padding of the
    # time axis once C >= 8, versus Th -> 8 padding (37.5% wasted vector
    # work at T=10) in the time-major layout.  Tiny chain counts keep the
    # time-major layout (C=1 would pad 1 -> 8 sublanes).
    c_sublane = C >= 8
    if c_sublane:
        xE, xO = (jnp.transpose(a, (0, 2, 1, 3)) for a in (xE, xO))
        epsE, epsO = (jnp.transpose(a, (0, 2, 1, 3)) for a in (epsE, epsO))
        muzE, muzO = (jnp.transpose(a, (0, 2, 1, 3)) for a in (muzE, muzO))
        uE, uO, sigzE, sigzO = (
            jnp.transpose(a, (1, 0, 2))
            for a in (uE, uO, sigzE, sigzO))
        params = jnp.transpose(params, (1, 0, 2))            # (8, C, n)
        x_shape = (d, Th, C, n_pad)
        a_shape = (Th, C, n_pad)
    else:
        x_shape = (d, C, Th, n_pad)
        a_shape = (C, Th, n_pad)

    # lane-block the scan-invariant streams (see _node_scan_kernel):
    # (·, s0, s1, n) -> (G, ·, s0, s1, 128).  The per-node streams are
    # consumed exactly once (at their node's own step), so they live in
    # HBM and each 128-node tile is DMA'd into a double-buffered scratch
    # one tile ahead — like the adjacency, this removes their VMEM
    # residency, which was the per-chain capacity cap.
    G = n_pad // 128

    def blk3(a):
        s0, s1 = a.shape[:2]
        return jnp.transpose(a.reshape(s0, s1, G, 128), (2, 0, 1, 3))

    def blk4(a):
        d_, s0, s1 = a.shape[:3]
        return jnp.transpose(a.reshape(d_, s0, s1, G, 128), (3, 0, 1, 2, 4))

    epsE, epsO, muzE, muzO = (blk4(a) for a in (epsE, epsO, muzE, muzO))
    uE, uO, sigzE, sigzO = (blk3(a) for a in (uE, uO, sigzE, sigzO))
    s0, s1 = epsE.shape[2], epsE.shape[3]

    # adjacency and the invariant streams stay in HBM (streamed by block
    # inside the kernel); only the position field and params are
    # VMEM-resident operands
    in_specs = ([pl.BlockSpec(memory_space=pltpu.VMEM)] * 3
                + [pl.BlockSpec(memory_space=pl.ANY)] * 2
                + [pl.BlockSpec(memory_space=pl.ANY)] * 8)
    stream_scr = (
        # stream tile scratch: eps/muz (2, d, s0, s1, 128) x2
        # parities, u/sigz (2, s0, s1, 128) x2 parities
        [pltpu.VMEM((2, d, s0, s1, 128), jnp.float32)] * 2
        + [pltpu.VMEM((2, s0, s1, 128), jnp.float32)] * 2
        + [pltpu.VMEM((2, d, s0, s1, 128), jnp.float32)] * 2
        + [pltpu.VMEM((2, s0, s1, 128), jnp.float32)] * 2
        + [pltpu.SemaphoreType.DMA((8, 2))])
    if stream16:
        # large-n: single-buffered bf16 16-row blocks, no stage buffers
        scratch = ([pltpu.VMEM((1, Th, 16, n_pad), jnp.bfloat16)] * 2
                   + [pltpu.SemaphoreType.DMA((2, 1))]
                   + stream_scr)
    else:
        scratch = ([pltpu.VMEM((2, Th, 32, n_pad), jnp.int8)] * 2
                   + [pltpu.VMEM((Th, 8, n_pad), jnp.float32)] * 2
                   + [pltpu.SemaphoreType.DMA((2, 2))]
                   + stream_scr)
    out_shape = (jax.ShapeDtypeStruct(x_shape, x_l.dtype),
                 jax.ShapeDtypeStruct(x_shape, x_l.dtype),
                 jax.ShapeDtypeStruct(a_shape, x_l.dtype),
                 jax.ShapeDtypeStruct(a_shape, x_l.dtype))
    xE_n, xO_n, accE, accO = pl.pallas_call(
        functools.partial(_node_scan_kernel, mixture=mixture,
                          directed=directed, n_real=n_real, T_total=T,
                          c_sublane=c_sublane, stream16=stream16),
        in_specs=in_specs,
        out_specs=tuple([pl.BlockSpec(memory_space=pltpu.VMEM)] * 4),
        out_shape=out_shape,
        scratch_shapes=scratch,
        # x is read once (into the fori carry) before the final write: the
        # parity halves update in place, saving two position-field copies
        # of per-chain VMEM (the capacity currency of this kernel)
        input_output_aliases={1: 0, 2: 1},
        interpret=interpret,
    )(params, xE, xO, *adj, epsE, epsO, uE, uO, muzE, muzO, sigzE, sigzO)
    if c_sublane:
        xE_n, xO_n = (jnp.transpose(a, (0, 2, 1, 3)) for a in (xE_n, xO_n))
        accE, accO = (jnp.transpose(a, (1, 0, 2)) for a in (accE, accO))
    x_out = _interleave_parity(xE_n, xO_n, 2, T)
    acc = _interleave_parity(accE, accO, 1, T)
    return x_out, acc


def node_scan_batch(Y, X, intercept, step_size, eps, log_u, *,
                    tau_sq, sigma_sq, radii=None, mu=None, sigma=None,
                    lmbda=None, z=None, mixture=False, temper=None,
                    interpret=False):
    """Chain-batched exact node scan.

    Shapes: X (C, T, n, d); intercept (C,) undirected / (C, 2) directed;
    lmbda (C,); tau_sq / sigma_sq scalars or (C,); step_size (C, T, n);
    eps (C, 2, n, T, d) and log_u (C, 2, n, T) in the XLA kernel's stream
    layout; radii (C, n) switches on the directed likelihood; mu (C, K, d);
    sigma (C, K); z (C, T, n); temper (C,) per-chain inverse temperatures
    scaling the network log-lik delta (None = untempered).  Y is shared
    (T, n, n).

    Returns (X_new (C, T, n, d), n_accepted (C, T, n)).
    """
    C, T, n, d = X.shape
    temp_arr = (jnp.ones((C,), X.dtype) if temper is None
                else jnp.broadcast_to(
                    jnp.reshape(jnp.asarray(temper, X.dtype), (C,)), (C,)))
    directed = radii is not None
    n_pad = max(-(-n // 128) * 128, 128)
    pad = n_pad - n

    # variant selection by CALIBRATED capacity: pick the layout that fits
    # more chains per invocation (tie -> int8, whose adjacency stream
    # reads a quarter of the HBM bytes).  stream16 — bf16 16-row blocks,
    # single-buffered, no stage — serves exact scans past the int8
    # layout's n-cap (~16384 undirected / ~8192 directed).  The stream16
    # capacity is only probed when the analytic model says it could beat
    # int8, so small/medium shapes pay one probe, not two.
    # _FORCE_STREAM16 lets the parity tests exercise the variant at any n.
    if _use_fullT(T, n_pad, directed):
        stream16 = False
        max_c = max(1, calibrated_max_chains(T, n_pad, directed, False,
                                             mixture))
    elif _FORCE_STREAM16:
        stream16 = True
        max_c = max(1, calibrated_max_chains(T, n_pad, directed, True,
                                             mixture))
    else:
        cap8 = calibrated_max_chains(T, n_pad, directed, False, mixture)
        stream16 = False
        max_c = cap8
        # switch layouts only when the extra capacity would actually be
        # used (C > cap8): at equal-or-sufficient capacity int8 wins on
        # HBM traffic (adjacency bytes are 4x smaller)
        if (cap8 < 1
                or (C > cap8
                    and _vmem_max_chains(T, n_pad, directed, clamp=False,
                                         stream16=True) > cap8)):
            cap16 = calibrated_max_chains(T, n_pad, directed, True,
                                          mixture)
            if cap16 > cap8:
                stream16 = True
                max_c = cap16
        if max_c < 1 and not interpret:
            raise ValueError(
                'node_scan_batch: no kernel layout fits VMEM at '
                'T=%d, n_pad=%d, directed=%s (calibrated capacities are '
                'zero); use mcmc.latent.xla_exact_scan or the '
                'case-control path at this scale' % (T, n_pad, directed))
        max_c = max(1, max_c)

    # (C, T, n, d) -> (d, C, T, n)
    x_l = jnp.pad(jnp.transpose(X, (3, 0, 1, 2)),
                  ((0, 0),) * 3 + ((0, pad),), constant_values=_PAD_POS)
    # adjacency is binary: int8 storage quarters its VMEM footprint, which
    # bounds how many chains fit per kernel.  Directed packs Y and Y^T into
    # ONE int8 stream (row j of packed = Y[j, :] + 2 * Y[:, j]); the kernel
    # decodes y = p - 2*floor(p/2), yt = floor(p/2) per row — exact for
    # values {0..3} — halving the directed adjacency DMA traffic, block
    # scratch, and stage conversions versus separate Y / Y^T streams.
    # stream16 keeps the same packing in bf16 (exact for {0..3}).
    y_dtype = jnp.bfloat16 if stream16 else jnp.int8
    Y_p = jnp.pad(Y, ((0, 0), (0, pad), (0, pad))).astype(y_dtype)
    if directed:
        Y_p = Y_p + 2 * jnp.swapaxes(Y_p, -1, -2)
    step_p = jnp.pad(step_size, ((0, 0),) * 2 + ((0, pad),))
    # eps (C, 2, n, T, d) -> (2, d, C, T, n)
    eps_l = jnp.pad(jnp.transpose(eps, (1, 4, 0, 3, 2)),
                    ((0, 0),) * 4 + ((0, pad),))
    u_l = jnp.pad(jnp.transpose(log_u, (0, 1, 3, 2)),      # (C, 2, T, n)
                  ((0, 0),) * 3 + ((0, pad),))

    if mixture:
        muz = jax.vmap(lambda m, zz: m[zz])(mu, z)           # (C, T, n, d)
        muz = jnp.pad(jnp.transpose(muz, (3, 0, 1, 2)),
                      ((0, 0),) * 3 + ((0, pad),))
        sigz = jax.vmap(lambda s, zz: s[zz])(sigma, z)
        sigz = jnp.pad(sigz, ((0, 0),) * 2 + ((0, pad),), constant_values=1.0)
        lam = jnp.reshape(lmbda, (C,))
        # the mixture prior never reads tau_sq: its params row carries the
        # per-chain tempering scalar instead (see _node_scan_kernel)
        tau_arr = temp_arr
        sig_arr = jnp.ones((C,), X.dtype)
    else:
        muz = jnp.zeros((d, C, T, n_pad), X.dtype)
        sigz = jnp.ones((C, T, n_pad), X.dtype)
        # the random-walk prior never reads lmbda: its params row carries
        # the per-chain tempering scalar instead
        lam = temp_arr
        tau_arr = jnp.broadcast_to(jnp.asarray(tau_sq, X.dtype), (C,))
        sig_arr = jnp.broadcast_to(jnp.asarray(sigma_sq, X.dtype), (C,))

    if directed:
        b = jnp.reshape(intercept, (C, 2))
        b_in_row = jnp.broadcast_to(b[:, 0:1], (C, n_pad))
        b_out_row = jnp.broadcast_to(b[:, 1:2], (C, n_pad))
        radii_row = jnp.pad(jnp.reshape(radii, (C, n)),
                            ((0, 0), (0, pad)), constant_values=1.0)
    else:
        b_in_row = jnp.broadcast_to(jnp.reshape(intercept, (C, 1)),
                                    (C, n_pad))
        b_out_row = jnp.zeros((C, n_pad), X.dtype)
        radii_row = jnp.ones((C, n_pad), X.dtype)

    rows = [b_in_row, b_out_row,
            jnp.broadcast_to(tau_arr[:, None], (C, n_pad)),
            jnp.broadcast_to(sig_arr[:, None], (C, n_pad)),
            jnp.broadcast_to(lam[:, None], (C, n_pad)),
            radii_row]
    if directed:
        # hoisted-reciprocal rows (see loglik_row): eta = (b_in + b_out)
        # - dist * (b_in/r_partner + b_out/r_self); the per-partner divides
        # happen once per sweep here instead of 4x per node step in-kernel
        rows += [b_in_row / radii_row, b_out_row / radii_row]
    else:
        rows += [jnp.zeros((C, n_pad), X.dtype)] * 2         # pad to 8 rows
    params = jnp.stack(rows, axis=1).astype(X.dtype)         # (C, 8, n_pad)

    operands = (x_l, step_p, eps_l, u_l, muz, sigz, params)
    call = functools.partial(_call_kernel, mixture=mixture,
                             directed=directed, n_real=n,
                             interpret=interpret, stream16=stream16)

    if C <= max_c:
        x_out, acc = call(Y_p, operands)
    else:
        # balance chains across groups: ceil(32/22)=2 groups run 16+16, not
        # 22+22 with 12 dead padded chains of kernel compute
        groups = -(-C // max_c)
        chunk_c = -(-C // groups)
        C_pad = groups * chunk_c

        def regroup(a, axis):
            widths = [(0, 0)] * a.ndim
            widths[axis] = (0, C_pad - C)
            a = jnp.pad(a, widths)
            shape = list(a.shape)
            shape[axis:axis + 1] = [groups, chunk_c]
            a = a.reshape(shape)
            return jnp.moveaxis(a, axis, 0)

        # chain axis: 1 for (d, C, ...) / (2, d, C, ...), else 0
        axes = (1, 0, 2, 0, 1, 0, 0)
        xs = tuple(regroup(a, ax) for a, ax in zip(operands, axes))

        def one_group(chunk):
            # regroup() moved the group axis to the front of each operand,
            # so every chunk already has the kernel's layout
            return call(Y_p, chunk)

        x_out, acc = jax.lax.map(one_group, xs)
        # x_out (groups, d, chunk_c, T, n) -> (d, C_pad, T, n)
        x_out = jnp.moveaxis(x_out, 0, 1).reshape(
            (x_out.shape[1], C_pad) + x_out.shape[3:])[:, :C]
        acc = acc.reshape((C_pad,) + acc.shape[2:])[:C]

    X_new = jnp.transpose(x_out, (1, 2, 3, 0))[:, :, :n, :]
    return X_new, acc[:, :, :n]


@functools.partial(jax.jit, static_argnames=('mixture', 'interpret'))
def _node_scan_with_noise(Y, X, intercept, step_size, eps, log_u, *,
                          tau_sq=0.0, sigma_sq=1.0, radii=None,
                          mu=None, sigma=None, lmbda=None, z=None,
                          mixture=False, temper=None, interpret=False):
    """Single-chain wrapper (adds C=1): same Markov kernel and proposal
    stream as :func:`dynetlsm_tpu.mcmc.latent.sample_latent_positions`."""
    X1 = X[None]
    b = jnp.asarray(intercept, X.dtype)
    b1 = b[None] if (radii is not None and b.ndim == 1) else jnp.reshape(b,
                                                                         (1,))
    X_new, acc = node_scan_batch(
        Y, X1, b1, step_size[None], eps[None], log_u[None],
        tau_sq=tau_sq, sigma_sq=sigma_sq,
        radii=None if radii is None else radii[None],
        mu=None if mu is None else mu[None],
        sigma=None if sigma is None else sigma[None],
        lmbda=None if lmbda is None else jnp.reshape(
            jnp.asarray(lmbda, X.dtype), (1,)),
        z=None if z is None else z[None],
        mixture=mixture,
        temper=None if temper is None else jnp.reshape(
            jnp.asarray(temper, X.dtype), (1,)),
        interpret=interpret)
    return X_new[0], acc[0]


@functools.lru_cache(maxsize=None)
def _custom_vmap_scan(mixture, directed=False):
    """custom_vmap wrapper: the driver vmaps the whole sweep over chains;
    this rule routes that batch axis into the kernel's chain dimension
    instead of a (sequential) Pallas grid."""

    def b_shape(intercept, C):
        return (jnp.reshape(intercept, (C, 2)) if directed
                else jnp.reshape(intercept, (C,)))

    if mixture:
        def single(Y, X, intercept, step, eps, log_u, radii, temper, mu,
                   sigma, lmbda, z):
            Xn, acc = node_scan_batch(
                Y, X[None], b_shape(intercept, 1), step[None],
                eps[None], log_u[None], tau_sq=0.0, sigma_sq=1.0,
                radii=radii[None] if directed else None,
                mu=mu[None], sigma=sigma[None],
                lmbda=jnp.reshape(lmbda, (1,)), z=z[None], mixture=True,
                temper=jnp.reshape(temper, (1,)))
            return Xn[0], acc[0]

        def batched(Y, X, intercept, step, eps, log_u, radii, temper, mu,
                    sigma, lmbda, z):
            C = X.shape[0]
            return node_scan_batch(
                Y, X, b_shape(intercept, C), step, eps, log_u,
                tau_sq=0.0, sigma_sq=1.0,
                radii=radii if directed else None, mu=mu, sigma=sigma,
                lmbda=jnp.reshape(lmbda, (C,)), z=z, mixture=True,
                temper=jnp.reshape(temper, (C,)))
    else:
        def single(Y, X, intercept, step, eps, log_u, radii, temper,
                   tau_sq, sigma_sq):
            Xn, acc = node_scan_batch(
                Y, X[None], b_shape(intercept, 1), step[None],
                eps[None], log_u[None], tau_sq=tau_sq, sigma_sq=sigma_sq,
                radii=radii[None] if directed else None, mixture=False,
                temper=jnp.reshape(temper, (1,)))
            return Xn[0], acc[0]

        def batched(Y, X, intercept, step, eps, log_u, radii, temper,
                    tau_sq, sigma_sq):
            C = X.shape[0]
            return node_scan_batch(
                Y, X, b_shape(intercept, C), step, eps, log_u,
                tau_sq=jnp.broadcast_to(tau_sq, (C,)),
                sigma_sq=jnp.broadcast_to(sigma_sq, (C,)),
                radii=radii if directed else None, mixture=False,
                temper=jnp.reshape(temper, (C,)))

    def xla_chain(Y, X, intercept, step, eps, log_u, radii, temper, *rest):
        from ..mcmc.latent import xla_exact_scan
        b = (jnp.reshape(intercept, (2,)) if directed
             else jnp.reshape(intercept, (1,)))
        r = radii if directed else None
        if mixture:
            mu, sigma, lmbda, z = rest
            return xla_exact_scan(Y, X, b, step, eps, log_u, radii=r,
                                  mu=mu, sigma=sigma, lmbda=lmbda, z=z,
                                  is_directed=directed, mixture=True,
                                  temper=temper)
        tau_sq, sigma_sq = rest
        return xla_exact_scan(Y, X, b, step, eps, log_u, radii=r,
                              tau_sq=tau_sq, sigma_sq=sigma_sq,
                              is_directed=directed, mixture=False,
                              temper=temper)

    f = jax.custom_batching.custom_vmap(single)

    @f.def_vmap
    def _rule(axis_size, in_batched, Y, *args):
        y_batched = in_batched[0]
        arg_batched = in_batched[1:]
        args = tuple(
            a if b else jnp.broadcast_to(
                jnp.asarray(a), (axis_size,) + jnp.shape(jnp.asarray(a)))
            for a, b in zip(args, arg_batched))
        T, n, d = args[0].shape[1:]
        n_pad = max(-(-n // 128) * 128, 128)
        max_c = max(1, calibrated_max_chains(T, n_pad, directed, False,
                                             mixture))
        if y_batched and (n >= 256 or axis_size <= min(16, max_c)):
            # per-chain networks (missing-data Gibbs): no shared-Y kernel,
            # fall back to mapping the single-chain program
            out = jax.lax.map(lambda ops: single(ops[0], *ops[1:]),
                              (Y,) + args)
        elif y_batched:
            # small network, many per-chain networks: vectorised XLA beats
            # a sequential map of single-chain kernels by orders of
            # magnitude (same crossover as the shared-Y branch below)
            out = jax.vmap(xla_chain)(Y, *args)
        elif n < 256 and axis_size > min(16, max_c):
            # small networks with many chains: XLA vectorises chains inside
            # each node step and wins past ~16 chains (measured dead heat
            # at C=16 on Sampson; 1.8x XLA at C=64) — and always when the
            # kernel would fall back to sequential lax.map chunks
            out = jax.vmap(lambda *a: xla_chain(Y, *a))(*args)
        else:
            out = batched(Y, *args)
        return out, (True, True)

    return f


def node_scan_dispatch(Y, X, intercept, step_size, eps, log_u, *,
                       tau_sq=None, sigma_sq=None, radii=None, mu=None,
                       sigma=None, lmbda=None, z=None, mixture=False,
                       temper=None):
    """Entry point used by mcmc.latent: batch-aware exact node scan.

    ``intercept`` is the (1,)/(2,) intercept vector; ``radii`` (n,) selects
    the directed likelihood; ``temper`` an optional per-chain scalar
    scaling the network log-lik delta (parallel tempering)."""
    directed = radii is not None
    f = _custom_vmap_scan(mixture, directed)
    b = intercept if directed else intercept[0]
    r = radii if directed else jnp.zeros((X.shape[1],), X.dtype)
    t = (jnp.ones((), X.dtype) if temper is None
         else jnp.asarray(temper, X.dtype))
    if mixture:
        return f(Y, X, jnp.asarray(b, X.dtype), step_size, eps,
                 log_u, r, t, mu, sigma, jnp.asarray(lmbda, X.dtype), z)
    return f(Y, X, jnp.asarray(b, X.dtype), step_size, eps, log_u, r, t,
             jnp.asarray(tau_sq, X.dtype), jnp.asarray(sigma_sq, X.dtype))
