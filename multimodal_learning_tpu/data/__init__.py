from .splits import load_cv_splits, make_synthetic_splits, save_splits
from .augment import (augment_view, augment_views, color_jitter,
                      normalize_batch, random_flips)
from .sampling import ContrastSampler, omic_transform
from .pipeline import (Loader, PathomicDataset, PrefetchLoader, make_loaders,
                       make_patches_loader)
