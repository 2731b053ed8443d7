from .native import (  # noqa: F401
    NativeBatchLoader,
    NativeSource,
    build_library,
    native_available,
    write_store,
)
