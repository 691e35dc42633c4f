from crop2seg_tpu.models.utae import UTAE
from crop2seg_tpu.models.timeunet import TimeUNet
from crop2seg_tpu.models.wtae import WTAE
