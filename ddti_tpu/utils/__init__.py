from .meters import AverageMeter  # noqa: F401
from .early_stopping import EarlyStopping  # noqa: F401
