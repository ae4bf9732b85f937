"""Training core: functional init/step/eval over pytrees, jitted epoch scans,
optax optimizers with torch-semantics schedulers, checkpointing, drivers."""
