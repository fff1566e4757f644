from .checkpoint import save_checkpoint, load_checkpoint, tolerant_merge  # noqa: F401
from .trainer import LesionSegChunkTrain  # noqa: F401
