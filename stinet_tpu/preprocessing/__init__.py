from stinet_tpu.preprocessing import native
from stinet_tpu.preprocessing.graph_levels import (
    process_scene, build_scene_levels, edges_from_faces, vertex_normals)
from stinet_tpu.preprocessing.dilation import compute_all_node_dilated_edges
from stinet_tpu.preprocessing.masks import (
    generate_masks_for_scene, circle_mask)
from stinet_tpu.preprocessing.crops import process_scene_crops
