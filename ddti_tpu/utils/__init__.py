from .meters import AverageMeter  # noqa: F401
from .early_stopping import EarlyStopping  # noqa: F401
from .weight_init import apply_init, kaiming_conv, xavier_dense  # noqa: F401
