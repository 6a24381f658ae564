from .approx_bic import select_bic, DynamicNetworkMixtureModel
from .posterior_vi import (
    posterior_expected_vi, time_averaged_posterior_expected_vi,
    minimize_posterior_expected_vi, batched_posterior_expected_vi,
    nonvectorized_posterior_expected_vi,
)
from .train_test_split import train_test_split
