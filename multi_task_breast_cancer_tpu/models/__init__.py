"""Model zoo: Flax linen modules, NHWC layout, TPU-first.

Architectural capability parity with the reference model zoo:
- segmentation: BTSUNet, FSB_BTS_UNet, nnUNet2021, ResidualUNet, BasicUNetPlusPlus
  (reference ``src/models/segmentation/``),
- classification: BTSUNetClassifier, UNetPlusPlusClassifier, nnUNetClassifier
  (reference ``src/models/classification/``),
- multitask: MTnnUNet, MTUNetPlusPlus, Multi_BTS_UNet, Multi_FSB_BTS_UNet, Adityan
  (reference ``src/models/multitask/``).
"""

from multi_task_breast_cancer_tpu.models.registry import (  # noqa: F401
    init_classification_model,
    init_multitask_model,
    init_segmentation_model,
)
