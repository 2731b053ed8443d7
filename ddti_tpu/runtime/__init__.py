from .native import (  # noqa: F401
    NativeBatchLoader,
    build_library,
    native_available,
    write_store,
)
