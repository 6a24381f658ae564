from .metropolis import (
    tune_step_size_random_walk, tune_step_size_dirichlet, maybe_tune,
    random_walk_accept, dirichlet_metropolis_step,
)
from .latent import sample_latent_positions
from .coefficients import (
    sample_intercept_undirected, sample_intercepts_directed, sample_radii,
)
from .labels import (
    sample_labels_block, sample_labels_block_lpcm, sample_labels_gibbs,
    latent_marginal_loglikelihood,
)
from .hdp import (
    sample_tables, sample_mbar, sample_concentration_param,
    sample_alpha_kappa_rho,
)
from .conjugate import (
    sample_cluster_means, sample_cluster_variances, sample_lambda,
    sample_mean_variance_hyper, sample_sigma_scale_hyper,
)
from .states import LSMState, MixtureState
from .sweeps import SweepConfig, make_lsm_sweep, make_lpcm_sweep, make_hdp_sweep
from .driver import (
    chain_mesh, shard_state, replicate_state, make_scan_runner, collect_traces,
)
from .tempering import (
    temper_ladder, replicate_tempered, make_pt_step,
)
