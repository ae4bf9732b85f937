"""Production serving subsystem.

The reference repo stops at offline evaluation scripts; deployment of the
trained models (the stated purpose of the CAD system, ``README.md`` §usage)
is left to the user. This subpackage is the TPU-native deployment story:

- :mod:`.export` — ahead-of-time compilation of a checkpoint into a
  self-contained, versioned serving artifact via ``jax.export`` (StableHLO):
  fixed batch-size buckets, multi-platform (cpu + tpu) lowering, weights
  stored separately from the compiled graphs so they can be hot-swapped
  without re-export. Serving a model no longer needs the model-building
  Python code, only jax.
- :mod:`.post` — shared output postprocessing (class probabilities, the
  pipeline-refinement rule, binary masks) used by both the offline
  ``predict`` CLI and the online server.
- :mod:`.server` — an online HTTP inference server (stdlib only) with
  dynamic micro-batching: concurrent requests are coalesced into one
  device batch, padded to the nearest compiled bucket, so TPU utilisation
  scales with load while a lone request still returns in one
  ``batch_wait_ms``.

CLI: ``python -m multi_task_breast_cancer_tpu.serve {export,run}``.
"""

from multi_task_breast_cancer_tpu.serve.export import (  # noqa: F401
    ExportedModel,
    export_inference,
    load_exported,
)
