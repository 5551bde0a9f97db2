from flashattention_kernel_project_tpu.utils.platform import (  # noqa: F401
    default_interpret,
    has_tpu,
    tpu_peak_flops,
    tpu_hbm_bandwidth,
)
from flashattention_kernel_project_tpu.utils.benchmarking import (  # noqa: F401
    BenchResult,
    benchmark,
    benchmark_chained,
)
from flashattention_kernel_project_tpu.utils import oracles  # noqa: F401
from flashattention_kernel_project_tpu.utils.testing import (  # noqa: F401
    max_abs_diff,
    rel_l2,
    assert_max_abs,
    assert_rel_l2,
)
from flashattention_kernel_project_tpu.utils import health  # noqa: F401,E402
