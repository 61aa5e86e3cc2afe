from .conv import (
    apply_conv,
    batch_norm,
    batch_norm_params,
    batch_norm_state,
    conv2d,
    conv_params,
    group_norm,
    group_norm_params,
    instance_norm,
)
from .pad import ImagePadder
from .pool import avg_pool2
from .resize import (
    downflow,
    interpolate_scale,
    resize_bilinear,
    resize_flow,
    upflow,
)
from .upsample import convex_upsample
from .voxel import event_preprocess, events_to_voxel_grid
from .warp import (
    backwarp,
    bilinear_sampler,
    frame_warp,
    grid_sample,
    sample_pixel_coords,
    warp_with_negated_flow,
)
