from equiadapt_tpu.native.loader import (
    NativeBatchLoader,
    native_available,
    write_record_file,
)

__all__ = ["NativeBatchLoader", "native_available", "write_record_file"]
