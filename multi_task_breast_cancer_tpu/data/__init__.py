"""Data layer: BUSI preprocessing, CV splits/oversampling, array datasets,
jit-able augmentation, SSIM duplicate curation."""
