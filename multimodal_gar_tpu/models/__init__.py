from .mgar import MGAR, GARFusionNet
from .registry import available_models, build_model, register
