from .voxel import (
    event_preprocess_numpy,
    events_to_voxel_grid_numpy,
    add_noise_to_voxel,
    event_preprocess,
    events_to_voxel_grid,
    events_to_voxel_grid_pol,
)
