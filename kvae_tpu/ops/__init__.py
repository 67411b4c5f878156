from kvae_tpu.ops.gaussian import (  # noqa: F401
    log_gaussian,
    mvn_logpdf,
    mvn_logpdf_chol,
    safe_cholesky,
    symmetrize,
)
from kvae_tpu.ops.lgssm import (  # noqa: F401
    FilterResult,
    SmoothResult,
    lgssm_elbo,
    lgssm_filter,
    lgssm_generate,
    lgssm_smooth,
)
