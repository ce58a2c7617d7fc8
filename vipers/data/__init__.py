from vipers.data.imagefolder import ImageFolder, ImageFolderLoader  # noqa: F401
from vipers.data.preprocess import (  # noqa: F401
    eval_preprocess,
    make_device_normalize,
    IMAGENET_MEAN,
    IMAGENET_STD,
)
from vipers.data.mixup import mixup_cutmix_batch  # noqa: F401
from vipers.data.sampler import ra_sampler_indices, shard_indices_for_host  # noqa: F401
from vipers.data.boxes import bbox_iou  # noqa: F401
