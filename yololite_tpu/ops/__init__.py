"""Device-side ops: box algebra, decode, NMS, preprocessing."""

from yololite_tpu.ops.boxes import (
    bbox2dist,
    bbox_iou,
    box_iou,
    bbox_ioa,
    clip_boxes_np,
    clip_coords,
    convert_batch2numpy,
    dist2bbox,
    ltwh2xywh,
    ltwh2xyxy,
    make_anchors,
    scale_boxes_np,
    scale_image_np,
    xywh2ltwh,
    xywh2xyxy,
    xywhn2xyxy,
    xyxy2ltwh,
    xyxy2xywh,
    xyxy2xywhn,
)
from yololite_tpu.ops.decode import decode_detections, dfl_expectation, flatten_levels
from yololite_tpu.ops.letterbox import LetterBox, preprocess_batch
from yololite_tpu.ops.nms import non_max_suppression
