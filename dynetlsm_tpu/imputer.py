"""Initial fill of missing (-1 coded) dyads (reference dynetlsm/imputer.py).

After this initial imputation the samplers Gibbs-resample missing dyads
every sweep (see mcmc/sweeps.py ``_resample_missing``).
"""
import numpy as np
from sklearn.utils import check_random_state


class SimpleNetworkImputer:
    """Fill missing dyads by per-time-step mode ('most_frequent') or a
    Bernoulli(density) draw ('random')."""

    def __init__(self, missing_value=-1, strategy='most_frequent',
                 random_state=123, copy=True):
        if strategy not in ('most_frequent', 'random'):
            raise ValueError(
                "strategy must be 'most_frequent' or 'random', got %r"
                % (strategy,))
        self.missing_value = missing_value
        self.strategy = strategy
        self.random_state = random_state
        self.copy = copy

    def fit(self, Y):
        Y = np.asarray(Y, dtype=np.float64)
        T, n, _ = Y.shape
        self.statistics_ = np.zeros(T)
        for t in range(T):
            observed = Y[t][Y[t] != self.missing_value]
            if observed.size == Y[t].size:
                continue
            if self.strategy == 'most_frequent':
                vals, counts = np.unique(observed, return_counts=True)
                self.statistics_[t] = vals[np.argmax(counts)]
            else:
                self.statistics_[t] = observed.sum() / (n * (n - 1))
        return self

    def transform(self, Y):
        Y = np.array(Y, dtype=np.float64, copy=True)
        if Y.shape[0] != self.statistics_.shape[0]:
            raise ValueError('time-step mismatch with fitted statistics')
        rng = check_random_state(self.random_state)
        for t in range(Y.shape[0]):
            if self.strategy == 'random':
                # impute the upper triangle and symmetrise
                iu = np.triu_indices(Y.shape[1], k=1)
                vec = Y[t][iu]
                miss = vec == self.missing_value
                vec[miss] = rng.binomial(1, self.statistics_[t], miss.sum())
                out = np.zeros_like(Y[t])
                out[iu] = vec
                Y[t] = out + out.T
            else:
                Y[t][Y[t] == self.missing_value] = self.statistics_[t]
        return Y

    def fit_transform(self, Y):
        return self.fit(Y).transform(Y)
