"""cista_flow_tpu — TPU-native event-camera video reconstruction framework.

A ground-up JAX/XLA/Pallas re-design with the capabilities of CISTA-Flow
(event → voxel → optical flow → motion-compensated CISTA-LSTC reconstruction;
reference: lsying009/CISTA-Flow, arXiv 2403.11961).

Design principles
-----------------
* NHWC layout everywhere (TPU-friendly: channels on the lane dimension).
* Functional modules: every model is ``init(rng, cfg) -> params`` plus a pure
  ``apply(params, ...) -> outputs`` that is jit/scan/shard_map friendly.
* Explicit recurrent state (no ``None`` branches under jit): zero-state
  constructors replace the reference's lazy state init
  (ref: e2v/e2v_model.py:65-66).
* Static shapes: images are padded to multiples of 32 with a compile-time
  ImagePadder (ref: utils/image_process.py:60-107).
* Parallelism via jax.sharding.Mesh + NamedSharding (data parallel batch
  sharding, optional 2-stage flow/rec model split), replacing the reference's
  manual 2-GPU split (ref: e2v/e2v_model.py:312-346).
"""

__version__ = "0.1.0"
