from flashattention_kernel_project_tpu.runtime import native  # noqa: F401
from flashattention_kernel_project_tpu.runtime.data import (  # noqa: F401
    TokenLoader,
    write_token_file,
)
