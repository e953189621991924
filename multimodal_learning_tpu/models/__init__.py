from .common import AlphaDropout, apply_act
from .factory import define_model
from .fusion import (Bilinear, BilinearFusion, HFBFusion, LMFusion,
                     PolynomialFusion, TrilinearFusion)
from .maxnet import MaxNet, MaxNetDecoder
from .mmdynamic import MMDynamic
from .pathomic import PathomicDynamicsModel, PathomicModel, PathomicOutput
from .resnet import ResNet18, ResNet34, ResNet50
from .resnet_decoder import ResnetDecoder
