"""L2 point-cloud ops — the native-equivalent inventory (SURVEY.md §2.3).

Every op is jit-compatible with static shapes: dynamic counts (points,
voxels, neighbors, detections) are represented as fixed budgets plus
validity masks. Overflow is dropped deterministically so results are
reproducible and oracle-testable (SURVEY.md §5.2: one-writer-per-cell /
sort-then-segment-reduce instead of atomics).

Op index (reference form per SURVEY.md §2.3 is CUDA/C++ extensions; here
everything is XLA or Pallas, fully on device):

  O1  voxelize.voxelize            point->voxel binning into fixed budgets
  O2  fps.farthest_point_sampling  iterative max-min sampling
  O3  ball_query.ball_query        fixed-K radius neighborhoods
  O4  grouping.group_points        gather + relative-coord decorate
  O5  three_nn.three_interpolate   k=3 inverse-distance upsampling
  O6  scatter.pillar_scatter       (P,C)+(P,2) -> dense BEV canvas
  O7  sparse_conv.build_rulebook   padded gather/scatter index pairs
  O8  sparse_conv.sparse_conv3d    gather-GEMM-scatter over rulebook
  O9  boxes.encode/decode          7-DoF residual box coding
  O10 rotated_iou.rotated_iou_bev  yawed-rectangle IoU (polygon clip)
  O11 nms.rotated_nms              greedy on-device NMS, fixed top-k
  O12 range_proj.range_project     spherical projection, z-buffer on range
  O13 knn_refine.knn_refine        range-window kNN label vote
  O14 boxes.points_in_rbbox        rotated-box membership test
  O15 (host) lisec_tpu.eval.kitti_ap  offline AP evaluation
"""

from lisec_tpu.ops.voxelize import voxelize, voxelize_batch, point_cell_ids
from lisec_tpu.ops.fps import farthest_point_sampling
from lisec_tpu.ops.ball_query import ball_query
from lisec_tpu.ops.grouping import group_points, gather_points
from lisec_tpu.ops.three_nn import three_nn, three_interpolate
from lisec_tpu.ops.scatter import pillar_scatter, pillar_scatter_max
from lisec_tpu.ops.boxes import (
    encode_boxes,
    decode_boxes,
    points_in_rbbox,
    boxes_to_corners_bev,
)
from lisec_tpu.ops.rotated_iou import rotated_iou_bev
from lisec_tpu.ops.nms import rotated_nms
from lisec_tpu.ops.range_proj import range_project, range_unproject
from lisec_tpu.ops.knn_refine import knn_refine
from lisec_tpu.ops.sparse_conv import (
    build_scatter_rulebook,
    sparse_conv3d_spread,
    build_output_coords,
    build_rulebook,
    sparse_conv3d,
    SparseConvSpec,
)

__all__ = [
    "voxelize", "voxelize_batch", "point_cell_ids",
    "farthest_point_sampling",
    "ball_query",
    "group_points", "gather_points",
    "three_nn", "three_interpolate",
    "pillar_scatter", "pillar_scatter_max",
    "encode_boxes", "decode_boxes", "points_in_rbbox", "boxes_to_corners_bev",
    "rotated_iou_bev",
    "rotated_nms",
    "range_project", "range_unproject",
    "knn_refine",
    "build_output_coords", "build_rulebook", "build_scatter_rulebook",
    "sparse_conv3d", "sparse_conv3d_spread", "SparseConvSpec",
]
