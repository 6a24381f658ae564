from .distributions import (
    sample_dirichlet, dirichlet_logpdf,
    truncated_normal, truncated_normal_logpdf,
    sample_categorical_logits, sample_inv_gamma, sample_gamma, sample_beta,
    multivariate_t_logpdf, multivariate_t_pdf,
)
from .procrustes import (
    procrustes_rotation, static_procrustes_rotation,
    longitudinal_procrustes_rotation, longitudinal_procrustes_transform,
)
from .init import (
    generalized_mds, longitudinal_kmeans, initialize_radii,
    scale_intercept_mle, directed_intercept_mle,
    shortest_path_dissimilarity,
)
