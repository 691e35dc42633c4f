from crop2seg_tpu.data.s2tsczcrop import (
    S2TSCZCropDataset, load_norm_values, PASTIS_CHANNEL_ORDER, LABELS,
)
from crop2seg_tpu.data.batcher import (BatchLoader, DeviceCacheLoader,
                                       PrefetchLoader, collate,
                                       DEFAULT_T_BUCKETS)
from crop2seg_tpu.data.transforms import Transform
from crop2seg_tpu.data.synthetic import (make_synthetic_dataset,
                                         make_synthetic_pastis)
