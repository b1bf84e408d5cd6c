"""YOLOLite facade (placeholder; full engine lands with predictor/trainer)."""


class YOLOLite:
    def __init__(self, model="yolo11n.pt", task="detect"):
        raise NotImplementedError("engine under construction")
