"""refid_tpu — a TPU-native event-based video restoration framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of REFID
("Event-based Frame Interpolation with Ad-hoc Deblurring", CVPR 2023,
reference: AHupuJR/REFID): single-image motion deblurring, sharp video
frame interpolation (VFI), and joint deblur+interpolation from two
reference frames plus the asynchronous event stream recorded between them.

Design (TPU-first, not a port):
  * NHWC tensor layout everywhere (TPU-native conv layout).
  * The bidirectional event recurrence is two ``jax.lax.scan``s over voxel
    bins instead of a Python loop (reference:
    basicsr/models/archs/XXNet_final_attenfusion_arch.py:172-216).
  * Data parallel + spatial (halo) parallel via a ``jax.sharding.Mesh``;
    XLA GSPMD inserts the collectives (replaces DDP/NCCL,
    reference: basicsr/models/base_model.py:57-75).
  * Event->voxel-grid scatter-add as a Pallas TPU kernel with a pure-jax
    fallback (reference: basicsr/data/event_util.py:6-66).
  * orbax checkpoints + one-way importer for reference ``.pth`` weights.
"""

__version__ = "0.1.0"
