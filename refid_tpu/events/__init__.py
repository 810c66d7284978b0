from refid_tpu.events.voxel import (
    events_to_voxel_grid,
    events_to_voxel_grid_jax,
    voxel_norm,
    voxel_norm_np,
    event_reverse,
    filter_event,
)

__all__ = [
    "events_to_voxel_grid",
    "events_to_voxel_grid_jax",
    "voxel_norm",
    "voxel_norm_np",
    "event_reverse",
    "filter_event",
]
