from stinet_tpu.models.stinet import (
    SurfaceTextureInpaintingNet, GraphResnetBlock, EdgeConvFilter,
    SageConvFilter, GraphNormLayer)
from stinet_tpu.models.factory import define_G, define_D, count_parameters
from stinet_tpu.models.singleconvmeshnet import SingleConvMeshNet
from stinet_tpu.models.resnet2d import Resnet2D
