from .mgar import MGAR, GARFusionNet
