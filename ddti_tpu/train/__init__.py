from .checkpoint import (  # noqa: F401
    load_params_npz,
    restore_checkpoint,
    save_checkpoint,
    save_params_npz,
)
from .engine import Trainer, aug_config_from  # noqa: F401
from .schedule import cosine_warm_restarts  # noqa: F401
from .state import (  # noqa: F401
    TrainState,
    count_params,
    create_train_state,
    make_optimizer,
)
from .steps import (  # noqa: F401
    StepMetrics,
    accumulate,
    gather_batch,
    make_eval_step,
    make_host_train_step,
    make_infer_step,
    make_threshold_sweep_step,
    make_train_step,
)
from .torch_interop import (  # noqa: F401
    export_state_dict,
    import_state_dict,
    load_pth,
    save_pth,
)
from .export import (  # noqa: F401
    export_serving,
    load_serving,
    load_serving_file,
    make_serve_fn,
    save_serving,
)
