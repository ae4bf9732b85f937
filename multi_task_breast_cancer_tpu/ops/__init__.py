"""Compute ops: losses (MONAI-semantics), metrics, image ops, Pallas kernels."""
