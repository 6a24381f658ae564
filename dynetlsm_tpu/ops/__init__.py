from .distances import pairwise_distances, distances_to_point
from .likelihoods import (
    undirected_loglik_full,
    undirected_partial_loglik,
    directed_loglik_full,
    directed_partial_loglik,
    directed_eta,
    directed_network_probas,
    undirected_network_probas,
    directed_intercept_grad,
    dynamic_network_loglikelihood_undirected,
    dynamic_network_loglikelihood_directed,
)
from .emissions import (
    spherical_normal_logpdf,
    emission_logliks,
    emission_likelihoods,
)
