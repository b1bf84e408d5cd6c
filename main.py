# yololite_tpu 🚀 — usage demo, mirroring the reference's main.py (ref main.py:1-16)

from yololite_tpu import YOLOLite

# Load a pretrained checkpoint (the reference .pt format imports directly) ...
# model = YOLOLite("yolo11n.pt")
# ... or build from the architecture YAML (random init — losses start high)
model = YOLOLite("yolo11n.yaml")

# Train on coco8 (pass your own dataset yaml; see yololite_tpu/cfg/default.yaml
# for every key). On CPU use smaller imgsz/epochs — the first step compiles.
results = model.train(data="/root/reference/coco8/coco8.yaml", epochs=1, imgsz=640)

# Inference
# results = model(["boats.jpg"])
# print(results[0].boxes)
