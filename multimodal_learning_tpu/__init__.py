"""multimodal_learning_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework with the
capabilities of CityU-AIM-Group/MultiModal-learning.

The reference implements three papers (MICCAI-2022 DC-Distill/GK-Refine, MIA-2022
M3LR/DSCD/GKM, MIA-2023 CLAT) on one shared substrate of pathology-image + genomic
multimodal glioma grading / survival models with privileged knowledge distillation.
This package implements that substrate once, TPU-first:

- ``config``    typed configs + argparse shim exposing the reference CLI flags
                (reference: ``MICCAI-2022/options.py``)
- ``data``      split readers, host decode, on-device augmentation, contrast-pair
                sampling (reference: ``data_loaders_MT.py``)
- ``models``    flax ResNet18 / MaxNet SNN / fusion modules / PathomicModel
                (reference: ``resnets.py``, ``networks_new.py``, ``fusion.py``)
- ``losses``    task + distillation losses (reference: ``utils.py``, ``KD_loss.py``,
                ``CL_utils/*``, ``distiller_zoo/*``)
- ``contrast``  functional CRD NCE memory banks, all generations
                (reference: ``CL_utils/CRD_criterion*.py``, ``memory_new.py``)
- ``gradweight`` gradient-guided teacher weighting via jax.vjp taps
                (reference: AEKD/GK-Refine in ``train_test_path_multi_distill*.py``)
- ``lowrank``   t-SVD / tensor-SVT machinery for M3LR (reference:
                ``MIA 2022/train_test_tSVD.py`` + the missing ``update_aux``)
- ``masking``   superpixel attention masking for CLAT stage 1 (reference:
                ``MIA 2023/stage1.../train_test_MT_SP_Masking.py``)
- ``parallel``  device mesh / sharding helpers (replaces torch DataParallel)
- ``train``     jitted train/eval steps, EMA, schedules, CV loops
- ``eval``      grading/survival metrics + patch->patient aggregation
                (reference: ``core/utils_analysis.py``)
- ``cli``       entry points preserving the reference driver surface
"""

__version__ = "0.1.0"
