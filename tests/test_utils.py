"""Utility-layer tests: settings persistence, decorators, plotting smoke, checks."""

import time
from pathlib import Path

import numpy as np
import pytest


def test_jsondict_persistence(tmp_path):
    from yololite_tpu.utils.misc import JSONDict

    f = tmp_path / "settings.json"
    d = JSONDict(f)
    d["alpha"] = 1
    d.update({"beta": [1, 2, 3]})
    d2 = JSONDict(f)
    assert d2["alpha"] == 1 and d2["beta"] == [1, 2, 3]
    del d2["alpha"]
    d3 = JSONDict(f)
    assert "alpha" not in d3


def test_settings_manager(tmp_path):
    from yololite_tpu.utils.misc import SettingsManager

    s = SettingsManager(file=tmp_path / "s.json", version="9.9")
    assert s["settings_version"] == "9.9"
    s["runs_dir"] = str(tmp_path / "runs")
    s2 = SettingsManager(file=tmp_path / "s.json", version="9.9")
    assert s2["runs_dir"] == str(tmp_path / "runs")
    s2.reset()
    assert s2["settings_version"] == "9.9"


def test_retry_decorator():
    from yololite_tpu.utils.misc import retry

    calls = []

    @retry(times=3, delay=0.01)
    def flaky():
        calls.append(1)
        if len(calls) < 3:
            raise ValueError("boom")
        return "ok"

    assert flaky() == "ok"
    assert len(calls) == 3


def test_tryexcept_swallows():
    from yololite_tpu.utils.misc import TryExcept

    @TryExcept("ctx")
    def bad():
        raise RuntimeError("x")

    bad()  # must not raise


def test_threading_locked_serializes():
    import threading

    from yololite_tpu.utils.misc import ThreadingLocked

    state = {"inside": 0, "max": 0}

    @ThreadingLocked()
    def work():
        state["inside"] += 1
        state["max"] = max(state["max"], state["inside"])
        time.sleep(0.01)
        state["inside"] -= 1

    threads = [threading.Thread(target=work) for _ in range(8)]
    [t.start() for t in threads]
    [t.join() for t in threads]
    assert state["max"] == 1


def test_check_imgsz():
    from yololite_tpu.utils.checks import check_imgsz, check_version

    assert check_imgsz(640, stride=32, min_dim=1) == 640
    assert check_imgsz(600, stride=32, min_dim=2) == [608, 608]
    assert check_imgsz([640, 480], stride=32) == [640, 480]
    assert check_version("2.1.0", "1.10.0")
    assert not check_version("0.9", "1.0")


def test_results_plot_and_annotator(tmp_path):
    from yololite_tpu.engine.results import Results

    img = np.full((120, 160, 3), 60, np.uint8)
    boxes = np.array([[10, 10, 80, 90, 0.9, 2], [40, 20, 120, 100, 0.5, 7]], np.float32)
    r = Results(img, "x.jpg", {2: "car", 7: "truck"}, boxes)
    out = r.plot()
    assert out.shape == img.shape and (out != img).any()
    assert "1 car" in r.verbose() and "1 truck" in r.verbose()
    f = r.save(tmp_path / "ann.jpg")
    assert Path(f).exists()
    js = r.to_json()
    assert "car" in js


def test_plot_images_and_results_csv(tmp_path):
    from yololite_tpu.utils.plotting import plot_images, plot_results

    imgs = np.random.default_rng(0).random((4, 64, 64, 3)).astype(np.float32)
    batch_idx = np.array([0, 0, 1, 2])
    cls = np.array([1, 2, 3, 4])
    bboxes = np.array([[0.5, 0.5, 0.3, 0.3]] * 4, np.float32)
    f = tmp_path / "mosaic.jpg"
    plot_images(imgs, batch_idx, cls, bboxes, fname=str(f), names={i: str(i) for i in range(5)})
    assert f.exists()

    csv = tmp_path / "results.csv"
    csv.write_text("epoch,box_loss,cls_loss\n1,3.0,5.0\n2,2.5,4.5\n3,2.0,4.0\n")
    out = plot_results(csv)
    assert Path(out).exists()


def test_profile_timer():
    from yololite_tpu.utils.profile import Profile

    p = Profile()
    with p:
        time.sleep(0.02)
    assert p.dt >= 0.015
    with p:
        time.sleep(0.02)
    assert p.t >= 0.03
