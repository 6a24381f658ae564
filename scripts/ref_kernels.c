/* Native (C) implementations of the reference's hot Cython kernels, used
 * by scripts/reference_shim.py when timing the reference sampler.
 *
 * The reference compiles these loops from Cython (.pyx -> C -> -O3); this
 * image has no Cython, so the shim's pure-NumPy stand-ins would charge the
 * reference per-call NumPy overhead it does not pay in reality.  These
 * functions reproduce the same scalar formulas (cited per function) as
 * plain C so the measured reference sweep rate reflects native-kernel
 * speed.  Formula sources:
 *   partial_loglik            <- static_network_fast.pyx:17-44
 *   directed_partial_loglik   <- directed_likelihoods_fast.pyx:46-80
 *   gaussian_likelihood       <- gaussian_likelihood_fast.pyx:17-54
 *   approx_directed_partial   <- directed_likelihoods_fast.pyx:83-182
 *
 * Build: g++ -O3 -shared -fPIC -o _ref_kernels.so ref_kernels.c
 */
#include <math.h>

extern "C" {

/* Row node_id of the undirected Bernoulli log-likelihood:
 * sum_{i != node_id} Y[node_id,i]*eta - log(1+exp(eta)),
 * eta = intercept - ||X_i - X_node||  (or squared distance). */
double partial_loglik(const double *Y, const double *X, double intercept,
                      long node_id, long n, long d, int squared) {
    double loglik = 0.0;
    const double *xn = X + node_id * d;
    for (long i = 0; i < n; ++i) {
        if (i == node_id) continue;
        double dist = 0.0;
        const double *xi = X + i * d;
        for (long k = 0; k < d; ++k) {
            double diff = xi[k] - xn[k];
            dist += diff * diff;
        }
        double eta = intercept - (squared ? dist : sqrt(dist));
        loglik += Y[node_id * n + i] * eta - log1p(exp(eta));
    }
    return loglik;
}

/* Both dyad directions touching node_id under the social-radii model:
 * eta_ij = b_in*(1 - d_ij/r_j) + b_out*(1 - d_ij/r_i). */
double directed_partial_loglik(const double *Y, const double *X,
                               const double *radii, double b_in,
                               double b_out, long node_id, long n, long d,
                               int squared) {
    double loglik = 0.0;
    const double *xn = X + node_id * d;
    double rn = radii[node_id];
    for (long j = 0; j < n; ++j) {
        if (j == node_id) continue;
        double dist = 0.0;
        const double *xj = X + j * d;
        for (long k = 0; k < d; ++k) {
            double diff = xj[k] - xn[k];
            dist += diff * diff;
        }
        if (!squared) dist = sqrt(dist);
        double eta = b_in * (1.0 - dist / radii[j])
                   + b_out * (1.0 - dist / rn);
        loglik += Y[node_id * n + j] * eta - log1p(exp(eta));
        eta = b_in * (1.0 - dist / rn)
            + b_out * (1.0 - dist / radii[j]);
        loglik += Y[j * n + node_id] * eta - log1p(exp(eta));
    }
    return loglik;
}

/* (T,K) spherical-normal emission matrix for one node's trajectory:
 * N(X_t ; mu_k, s_k I) at t=0, N(X_t ; l*mu_k + (1-l)*X_{t-1}, s_k I)
 * afterwards; optionally row-max normalised and exponentiated. */
void gaussian_likelihood(const double *X, const double *mu,
                         const double *sigma, double lmbda, long T, long K,
                         long d, int normalize, double *out) {
    for (long t = 0; t < T; ++t) {
        const double *xt = X + t * d;
        const double *xp = (t > 0) ? X + (t - 1) * d : 0;
        for (long k = 0; k < K; ++k) {
            const double *muk = mu + k * d;
            double var = sigma[k];
            double sum_sq = 0.0;
            for (long j = 0; j < d; ++j) {
                double m = (t == 0) ? muk[j]
                                    : lmbda * muk[j] + (1.0 - lmbda) * xp[j];
                double diff = xt[j] - m;
                sum_sq += diff * diff;
            }
            out[t * K + k] = -0.5 * d * log(2.0 * M_PI * var)
                             - 0.5 * sum_sq / var;
        }
    }
    if (normalize) {
        for (long t = 0; t < T; ++t) {
            double mx = out[t * K];
            for (long k = 1; k < K; ++k)
                if (out[t * K + k] > mx) mx = out[t * K + k];
            for (long k = 0; k < K; ++k)
                out[t * K + k] = exp(out[t * K + k] - mx);
        }
    } else {
        for (long t = 0; t < T * K; ++t) out[t] = exp(out[t]);
    }
}

/* Case-control approximation of one directed row/column pair: exact edge
 * terms + (n-1)/m - scaled control log(1+exp(eta)) terms over sampled
 * non-edges, per directed_likelihoods_fast.pyx:83-182.  in_edges/out_edges
 * are (n, max_deg) index matrices padded past degree; controls is (n, m). */
double approx_directed_partial_loglik(
        const double *X, const double *radii, double b_in, double b_out,
        const long *in_edges, const long *in_deg, const long *out_edges,
        const long *out_deg, const long *controls, long max_deg,
        long n_control, long node_id, long n, long d, int squared) {
    const double *xn = X + node_id * d;
    double rn = radii[node_id];
    double control_adj = (double)(n - 1) / (double)n_control;
    double loglik = 0.0;

    /* helper-free inline distance */
#define DIST_TO(idx, outv)                              \
    do {                                                \
        double acc = 0.0;                               \
        const double *xj = X + (idx) * d;               \
        for (long kk = 0; kk < d; ++kk) {               \
            double diff = xj[kk] - xn[kk];              \
            acc += diff * diff;                         \
        }                                               \
        (outv) = squared ? acc : sqrt(acc);             \
    } while (0)

    /* out-edges: node -> j */
    for (long e = 0; e < out_deg[node_id]; ++e) {
        long j = out_edges[node_id * max_deg + e];
        double dist, eta;
        DIST_TO(j, dist);
        eta = b_in * (1.0 - dist / radii[j]) + b_out * (1.0 - dist / rn);
        loglik += eta;
    }
    /* in-edges: j -> node */
    for (long e = 0; e < in_deg[node_id]; ++e) {
        long j = in_edges[node_id * max_deg + e];
        double dist, eta;
        DIST_TO(j, dist);
        eta = b_in * (1.0 - dist / rn) + b_out * (1.0 - dist / radii[j]);
        loglik += eta;
    }
    /* control sums for both directions */
    double control = 0.0;
    for (long e = 0; e < n_control; ++e) {
        long j = controls[node_id * n_control + e];
        double dist, eta;
        DIST_TO(j, dist);
        eta = b_in * (1.0 - dist / radii[j]) + b_out * (1.0 - dist / rn);
        control += log1p(exp(eta));
        eta = b_in * (1.0 - dist / rn) + b_out * (1.0 - dist / radii[j]);
        control += log1p(exp(eta));
    }
#undef DIST_TO
    return loglik - control_adj * control;
}

}  /* extern "C" */
