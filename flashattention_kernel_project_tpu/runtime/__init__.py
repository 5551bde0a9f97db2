from flashattention_kernel_project_tpu.runtime import native  # noqa: F401
