from .subm_conv import subm_conv_pallas, subm_conv_xla
