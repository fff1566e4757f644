from .bootstrap_bce import BootBinCrossEntropy, BinaryCrossEntropySmooth  # noqa: F401
from .interval_reg import IntRegLoss, CTSS_RATIO_LB, CTSS_RATIO_UB  # noqa: F401
from .refine import IntRegRefineLoss  # noqa: F401
from .equivariance import IntRegAffLoss, IntRegAffRefineLoss  # noqa: F401
