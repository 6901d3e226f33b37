from tpu_flash.utils.layout import (
    circulant_neighbors,
    window,
    unwindow,
    window_counts,
    flatten_spatial,
    unflatten_spatial,
)
