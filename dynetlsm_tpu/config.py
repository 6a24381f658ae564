"""Global numeric configuration for the TPU-native dynetlsm rebuild.

The reference library (joshloyal/dynetlsm) runs float64 NumPy/Cython on CPU.
On TPU the native vector/matrix units are float32/bfloat16, so the sampler
runs in float32 with stable (softplus / log-sum-exp) formulations everywhere
a naive float64 translation would lose accuracy.
"""
import numpy as np

# Default floating dtype for all device computation.
DTYPE = np.float32

# Integer dtype for labels / counts.
ITYPE = np.int32

# Small positive constant guarding logs / Dirichlet concentrations,
# mirroring SMALL_EPS = np.finfo('float64').tiny in the reference
# (hdp_lpcm.py:42) but scaled for float32.
SMALL_EPS = np.float32(np.finfo(np.float32).tiny)

# log-of-weight guard used by the HMM label samplers
# (reference sample_labels.py:46 uses 1e-5).
LOG_GUARD = 1e-5
