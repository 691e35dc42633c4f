from crop2seg_tpu.models.utae import UTAE
from crop2seg_tpu.models.timeunet import TimeUNet
from crop2seg_tpu.models.timeunet_v2 import TimeUNetV2
from crop2seg_tpu.models.wtae import WTAE
from crop2seg_tpu.models.unet3d import UNet3D
from crop2seg_tpu.models.convlstm import ConvLSTMSeg, BConvLSTMSeg
from crop2seg_tpu.models.convgru import ConvGRUSeg
from crop2seg_tpu.models.recunet import RecUNet
from crop2seg_tpu.models.unet import Unet, UnetNaive
from crop2seg_tpu.models.unet_ex import UNetEx
from crop2seg_tpu.models.mlp_mixer import MLPMixer
from crop2seg_tpu.models.factory import get_model
