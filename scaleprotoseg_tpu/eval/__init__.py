from scaleprotoseg_tpu.eval.miou import SegEvaluator, iou_from_confusion  # noqa: F401
