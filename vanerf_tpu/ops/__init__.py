from .grid_sample import feat_sample, feat_sample_nhwc, grid_sample_2d  # noqa: F401
from .ray import get_rays_np, get_near_far_np, ray_bbox_intersection  # noqa: F401
from .sampling import stratified_sample, importance_sample  # noqa: F401
from .composite import rgba2out  # noqa: F401
from .knn import knn_gather_1  # noqa: F401
from .mesh_query import (  # noqa: F401
    point_mesh_sdf, cal_vis_sdf, barycentric_of_projection, winding_number)
from .rasterize import rasterize_zbuffer, vertex_visibility, render_vis_map  # noqa: F401
