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


def test_save_one_box_semantics(tmp_path):
    """gain=1.02, pad=10, square, clipping match the reference formula."""
    import numpy as np

    from yololite_tpu.utils.plotting import save_one_box

    im = np.arange(200 * 200 * 3, dtype=np.uint8).reshape(200, 200, 3)
    crop = save_one_box(np.array([50.0, 60.0, 90.0, 80.0]), im.copy(), save=False, BGR=True)
    # xywh = (70, 70, 40, 20); wh*1.02+10 = (50.8, 30.4) -> xyxy (44.6,54.8,95.4,85.2) -> long
    assert crop.shape == (31, 51, 3)  # y: 54..85, x: 44..95
    sq = save_one_box(np.array([50.0, 60.0, 90.0, 80.0]), im.copy(), square=True, save=False, BGR=True)
    assert sq.shape[0] == sq.shape[1]  # square crop
    f = tmp_path / "crops" / "thing.jpg"
    save_one_box(np.array([50.0, 60.0, 90.0, 80.0]), im.copy(), file=f, BGR=True)
    assert f.exists()


def test_plot_tune_results(tmp_path):
    import numpy as np

    from yololite_tpu.utils.plotting import plot_tune_results

    rng = np.random.default_rng(0)
    csv = tmp_path / "tune_results.csv"
    rows = ["fitness,lr0,momentum"]
    for _ in range(20):
        rows.append(",".join(f"{v:.5f}" for v in rng.random(3)))
    csv.write_text("\n".join(rows))
    plot_tune_results(str(csv))
    assert (tmp_path / "tune_scatter_plots.png").exists()
    assert (tmp_path / "tune_fitness.png").exists()


def test_output_to_target():
    import numpy as np

    from yololite_tpu.utils.plotting import output_to_target

    dets = np.zeros((2, 5, 6), np.float32)
    dets[0, 0] = [10, 20, 30, 40, 0.9, 2]
    dets[1, 0] = [0, 0, 10, 10, 0.8, 1]
    dets[1, 1] = [5, 5, 15, 15, 0.7, 0]
    bi, cls, boxes, conf = output_to_target(dets)
    assert list(bi) == [0, 1, 1]
    assert list(cls) == [2, 1, 0]
    np.testing.assert_allclose(boxes[0], [20, 30, 20, 20])
    np.testing.assert_allclose(conf, [0.9, 0.8, 0.7])


def test_box_converters_roundtrip():
    import numpy as np

    from yololite_tpu.ops.boxes import ltwh2xywh, ltwh2xyxy, xywh2ltwh, xyxy2ltwh

    x = np.array([[10.0, 20.0, 4.0, 8.0]])
    np.testing.assert_allclose(ltwh2xywh(xywh2ltwh(x)), x)
    xy = np.array([[1.0, 2.0, 5.0, 10.0]])
    np.testing.assert_allclose(ltwh2xyxy(xyxy2ltwh(xy)), xy)


def test_clean_str():
    from yololite_tpu.utils.misc import clean_str

    assert clean_str("a|b@c#d") == "a_b_c_d"


def test_results_to_xml():
    import numpy as np

    from yololite_tpu.engine.results import Results

    img = np.zeros((64, 64, 3), np.uint8)
    r = Results(img, path="x.jpg", names={0: "person"},
                boxes=np.array([[1.0, 2.0, 10.0, 12.0, 0.9, 0]]))
    xml = r.to_xml()
    assert "person" in xml and xml.startswith("<?xml")
    empty = Results(img, path="x.jpg", names={0: "person"}, boxes=np.zeros((0, 6)))
    assert "<root></root>" in empty.to_xml()


def test_annotator_surface():
    """Expanded Annotator drawing surface (reference plotting.py:151-693)."""
    import numpy as np

    from yololite_tpu.utils.plotting import Annotator

    im = np.zeros((200, 300, 3), np.uint8)
    a = Annotator(im.copy())
    a.box_label([10, 10, 100, 80], "person 0.9", color=(255, 42, 4))
    a.box_label(np.array([[120, 20], [180, 30], [170, 90], [115, 75]]), "obb", rotated=True)
    a.circle_label([10, 100, 80, 160], "12345")  # truncates to 3 chars
    a.text_label([150, 100, 280, 160], "queue")
    a.text((5, 190), "hello", box_style=True)
    a.rectangle((200, 5, 290, 40), outline=(0, 255, 0), width=2)
    a.draw_region([(10, 10), (290, 10), (290, 190), (10, 190)], thickness=2)
    a.draw_centroid_and_tracks([(20, 20), (40, 35), (60, 60)])
    a.visioneye([200, 100, 260, 150], (150, 195))
    w, h, area = Annotator.get_bbox_dimension([10, 10, 100, 80])
    assert (w, h, area) == (90, 70, 6300)
    out = a.result()
    assert out.shape == im.shape and out.any(), "drawing must modify pixels"
    # dark-background label gets dark-on-light text color
    assert a.get_txt_color((255, 255, 0)) == (104, 31, 17)
    assert a.get_txt_color((255, 42, 4)) == (255, 255, 255)
    assert a.get_txt_color((1, 2, 3), (9, 9, 9)) == (9, 9, 9)


def test_get_latest_run(tmp_path):
    import os
    import time as _time

    from yololite_tpu.utils import get_latest_run

    assert get_latest_run(tmp_path) == ""
    for name in ("train10", "train9"):  # create train10 FIRST: lexical != recency
        d = tmp_path / name / "weights"
        d.mkdir(parents=True)
        (d / "last.npz").write_bytes(b"x")
        _time.sleep(0.01)
    latest = get_latest_run(tmp_path)
    assert "train9" in str(latest), "must pick the most recent run by ctime, not name"


def test_output_to_rotated_target():
    import numpy as np

    from yololite_tpu.utils.plotting import output_to_rotated_target, output_to_target

    out = np.zeros((2, 4, 7), np.float32)
    out[0, 0] = [10, 10, 20, 20, 0.9, 3, 0.5]  # xywh, conf, cls, angle
    out[1, 1] = [5, 5, 8, 8, 0.7, 1, -0.2]
    b, c, boxes, conf = output_to_rotated_target(out)
    assert boxes.shape == (8, 5)  # xywh + angle
    assert b[0] == 0 and b[4] == 1
    np.testing.assert_allclose(boxes[0], [10, 10, 20, 20, 0.5])
    # plain variant drops padded rows (conf==0)
    t = output_to_target(np.concatenate([out[..., :6]], -1))
    assert t[2].shape[1] == 4


def test_annotator_pil_branch():
    """Non-ASCII example text switches the Annotator to the PIL draw path
    (reference plotting.py:163-175)."""
    from yololite_tpu.utils.plotting import Annotator

    im = np.zeros((64, 64, 3), np.uint8)
    ann = Annotator(im.copy(), example="中文")
    assert ann.pil
    ann.box_label((5, 15, 40, 50), "人 0.91", color=(255, 42, 4))
    ann.text([2, 2], "line1\nline2", box_style=True)
    ann.rectangle((1, 1, 10, 10), outline=(0, 255, 0))
    out = ann.result()
    assert isinstance(out, np.ndarray) and out.shape == (64, 64, 3)
    assert out.any()  # something was drawn
    # explicit pil=True and PIL input also select the branch
    from PIL import Image

    assert Annotator(Image.fromarray(im)).pil
    assert Annotator(im.copy(), pil=True).pil
    # ASCII example keeps cv2
    a2 = Annotator(im.copy(), example="abc")
    assert not a2.pil
    a2.fromarray(im.copy())
    assert isinstance(a2.im, np.ndarray)


def test_annotator_solutions_helpers():
    """Queue/parking/workout/distance helpers draw without error and mutate the
    image (reference plotting.py:476-676)."""
    from yololite_tpu.utils.plotting import Annotator

    im = np.zeros((120, 160, 3), np.uint8)
    ann = Annotator(im)
    ann.queue_counts_display("Queue: 3", points=[(10, 10), (100, 10), (100, 80), (10, 80)])
    ann.display_objects_labels(ann.im, "car", (255, 255, 255), (50, 50, 50), 60, 40, 5)
    ann.display_analytics(ann.im, {"total": 7, "free": 2}, (255, 255, 255), (0, 0, 0), 4)
    h = ann.plot_workout_information("Reps 12", (20, 100))
    assert h > 0
    ann.plot_angle_and_count_and_stage(93.5, 4, "up", (30, 30))
    ann.plot_distance_and_line(42.0, [(10, 110), (150, 110)])
    assert ann.im.any()
    # angle of a right angle is 90 degrees
    assert abs(Annotator.estimate_pose_angle((0, 1), (0, 0), (1, 0)) - 90.0) < 1e-6


def test_results_device_shims(monkeypatch):
    """Results.new/cpu/numpy/cuda/to/show mirror the reference surface
    (reference results.py:115-127, 215-228)."""
    from yololite_tpu.engine.results import Results

    img = np.zeros((32, 32, 3), np.uint8)
    det = np.array([[2.0, 3.0, 20.0, 22.0, 0.9, 1.0]], np.float32)
    r = Results(img, "x.jpg", {0: "a", 1: "b"}, boxes=det)

    r2 = r.new()
    assert len(r2) == 0 and r2.names is r.names and r2.path == r.path

    assert r.cpu() is r and r.numpy() is r and r.cuda() is r
    r16 = r.to(np.float16)
    assert r16.boxes.data.dtype == np.float16 and len(r16) == 1
    assert r.to("cpu") is r  # device string: no-op

    shown = []
    from yololite_tpu.utils import plotting as P

    monkeypatch.setattr(P.Annotator, "show", lambda self, title=None: shown.append(title))
    r.show()
    assert shown == ["x.jpg"]


def test_check_imshow_and_print_args():
    from yololite_tpu.utils.checks import check_imshow, print_args

    assert check_imshow(warn=False) in (True, False)  # headless sandbox -> False

    import io
    import logging

    from yololite_tpu.utils import LOGGER

    buf = io.StringIO()
    h = logging.StreamHandler(buf)
    LOGGER.addHandler(h)
    try:
        def demo(alpha=3, beta="x"):
            print_args()

        demo()
        print_args({"k": 1}, show_file=False, show_func=True)
    finally:
        LOGGER.removeHandler(h)
    out = buf.getvalue()
    assert "alpha=3" in out and "beta=x" in out and "k=1" in out


def test_env_and_host_utilities(tmp_path):
    """Reference utility-sweep parity: env sniffers, URL/string helpers, seeds
    (reference utils/__init__.py:219-607, torch_utils.py:267-313)."""
    from yololite_tpu.utils import misc as M

    assert M.url2file("https://x.com/a/weights.pt?token=abc") == "weights.pt"
    assert M.clean_url("https://x.com/a/file.txt?auth") == "https://x.com/a/file.txt"
    assert M.remove_colorstr("\x1b[34m\x1b[1mhello\x1b[0m") == "hello"
    assert M.emojis("plain") == "plain"
    for fn in (M.is_colab, M.is_kaggle, M.is_jupyter, M.is_docker, M.is_ubuntu,
               M.is_raspberrypi, M.is_jetson, M.is_github_action_running):
        assert fn() in (True, False)
    assert M.is_pytest_running() is True
    assert M.is_dir_writeable(tmp_path)
    assert M.get_user_config_dir().name == "yololite_tpu"
    assert M.get_default_args(lambda a, b=3, c="x": None) == {"b": 3, "c": "x"}

    class A: pass
    class B:
        def __init__(self):
            self.x, self._h, self.y = 1, 2, 3
    a = A()
    M.copy_attr(a, B(), exclude=("y",))
    assert a.x == 1 and not hasattr(a, "_h") and not hasattr(a, "y")

    import numpy as np
    M.init_seeds(5)
    v1 = np.random.rand()
    M.init_seeds(5)
    assert np.random.rand() == v1

    done = []
    t = M.threaded(lambda: done.append(1))()
    t.join(5)
    assert done == [1]
    assert M.threaded(lambda: 42)(threaded=False) == 42

    @M.smart_inference_mode()
    def f():
        return "ok"
    assert f() == "ok"
    assert M.time_sync() > 0
    assert M.default_class_names()[3] == "class3"

    from yololite_tpu.utils.checks import parse_version
    assert parse_version("11.2.9+cpu") == (11, 2, 9)


def test_dataset_yaml_and_cache_helpers(tmp_path):
    from yololite_tpu.data.utils import find_dataset_yaml, load_dataset_cache_file, save_dataset_cache_file

    (tmp_path / "data.yaml").write_text("names: {0: a}")
    assert find_dataset_yaml(tmp_path).name == "data.yaml"
    save_dataset_cache_file("t: ", tmp_path / "labels.cache", {"labels": [1]})
    assert load_dataset_cache_file(tmp_path / "labels.cache")["labels"] == [1]


def test_plot_curves_and_scale_img(tmp_path):
    import numpy as np

    from yololite_tpu.utils.metrics import plot_mc_curve, plot_pr_curve, smooth

    px = np.linspace(0, 1, 101)
    plot_pr_curve(px, [np.linspace(1, 0, 101)] * 2, np.random.rand(2, 10),
                  tmp_path / "pr.png", {0: "a", 1: "b"})
    plot_mc_curve(px, np.random.rand(2, 101), tmp_path / "mc.png", {0: "a", 1: "b"})
    assert (tmp_path / "pr.png").exists() and (tmp_path / "mc.png").exists()
    assert len(smooth(np.random.rand(101))) == 101  # odd-filter length invariant

    import jax.numpy as jnp

    from yololite_tpu.ops.letterbox import scale_img

    x = jnp.ones((1, 64, 64, 3), jnp.float32)
    y = scale_img(x, 0.7)
    assert y.shape == (1, 64, 64, 3)  # padded back to the /32 grid
    assert abs(float(y[0, -1, -1, 0]) - 0.447) < 1e-6  # ImageNet-mean fill
    assert scale_img(x, 1.0) is x


def test_batch_probiou():
    import numpy as np

    from yololite_tpu.ops.rotated import batch_probiou

    a = np.array([[10, 10, 4, 6, 0.2]], np.float32)
    b = np.array([[10, 10, 4, 6, 0.2], [40, 40, 2, 2, 0.0]], np.float32)
    out = np.asarray(batch_probiou(a, b))
    assert out.shape == (1, 2)
    assert out[0, 0] > 0.99 and out[0, 1] < 0.01


def test_simpleclass_and_env_sniffers(tmp_path):
    """Round-3 crumb sweep: SimpleClass display base, git/pip env sniffers,
    set_logging, get_cpu_info, parse_requirements, convert_batch2numpy,
    select_device (reference utils/__init__.py:80-103,173-216,458-561,
    torch_utils.py:69-172, checks.py:32-54, ops.py:487)."""
    import numpy as np

    from yololite_tpu.utils import set_logging
    from yololite_tpu.utils import misc as M

    # SimpleClass: attribute dump + helpful missing-attribute error
    class Thing(M.SimpleClass):
        """Thing docs."""
        def __init__(self):
            self.alpha, self._hidden = 1, 2
    t = Thing()
    s = str(t)
    assert "alpha: 1" in s and "_hidden" not in s and "Thing object with attributes" in s
    assert repr(t) == s
    try:
        t.nope
        raise AssertionError("expected AttributeError")
    except AttributeError as e:
        assert "Thing docs." in str(e)

    # Results/Boxes/DetMetrics inherit the display base like the reference
    from yololite_tpu.engine.results import Boxes, Results
    from yololite_tpu.utils.metrics import DetMetrics
    img = np.zeros((8, 8, 3), np.uint8)
    r = Results(img, "x.jpg", {0: "a"}, boxes=np.array([[0, 0, 4, 4, 0.9, 0]], np.float32))
    assert isinstance(r, M.SimpleClass) and isinstance(r.boxes, M.SimpleClass)
    assert "boxes:" in str(r) and "conf:" in str(r.boxes)
    assert isinstance(DetMetrics(), M.SimpleClass)
    assert r.boxes.cuda() is r.boxes and r.boxes.to("cpu") is r.boxes  # BaseTensor device shims
    assert r.tojson() == r.to_json()  # deprecated alias (ref results.py:418)

    # env sniffers
    assert M.is_pip_package("numpy") is True and M.is_pip_package() in (True, False)
    assert M.is_git_dir() in (True, False)
    if M.is_git_dir():
        assert M.get_git_dir().is_dir()
        assert M.get_git_branch() is None or isinstance(M.get_git_branch(), str)
        url = M.get_git_origin_url()
        assert url is None or isinstance(url, str)
    assert isinstance(M.get_cpu_info(), str) and M.get_cpu_info() != ""

    # set_logging is idempotent (no duplicate handlers) and returns the logger
    lg1 = set_logging("yololite_tpu_test", verbose=True)
    lg2 = set_logging("yololite_tpu_test", verbose=True)
    assert lg1 is lg2 and len(lg1.handlers) == 1

    # parse_requirements: file form with comments + installed-package form
    req = tmp_path / "requirements.txt"
    req.write_text("# header\nnumpy>=1.20  # inline\n\npyyaml\n")
    parsed = {r.name: r.specifier for r in __import__("yololite_tpu.utils.checks", fromlist=["x"]).parse_requirements(req)}
    assert parsed == {"numpy": ">=1.20", "pyyaml": ""}

    # convert_batch2numpy: NHWC normalized floats -> list of BGR uint8
    from yololite_tpu.ops.boxes import convert_batch2numpy
    batch = np.zeros((2, 4, 4, 3), np.float32)
    batch[..., 0] = 1.0  # R channel
    out = convert_batch2numpy(batch)
    assert len(out) == 2 and out[0].dtype == np.uint8
    assert out[0][0, 0].tolist() == [0, 0, 255]  # RGB -> BGR flip

    # select_device: parses strings, enforces multi-device batch divisibility
    from yololite_tpu.parallel.mesh import select_device
    devs = select_device("cpu", verbose=False)
    assert len(devs) >= 1 and devs[0].platform == "cpu"
    assert select_device("", verbose=False)
    assert select_device("0", verbose=False)[0].id == 0
    n = len(__import__("jax").devices())
    if n > 1:
        import pytest
        with pytest.raises(ValueError, match="multiple of device count"):
            select_device(",".join(str(i) for i in range(n)), batch=n + 1, verbose=False)
        with pytest.raises(ValueError, match="batch<1"):
            select_device(",".join(str(i) for i in range(n)), batch=0, verbose=False)
        assert len(select_device("0,1", batch=4, verbose=False)) == 2


def test_unicode_image_io(tmp_path):
    """utils/patches imread/imwrite round-trip through non-ASCII paths.

    Counterpart of reference utils/patches.py:14-46 (imdecode/np.fromfile route
    around cv2's C-side fopen); Components #33.
    """
    import numpy as np

    from yololite_tpu.utils.patches import imread, imwrite

    img = np.zeros((8, 10, 3), np.uint8)
    img[2:5, 3:7] = (0, 128, 255)
    p = tmp_path / "图片_测试_ünïcode.png"
    assert imwrite(p, img)
    back = imread(p)
    assert back is not None and back.shape == (8, 10, 3)
    assert np.array_equal(back, img)  # png is lossless

    # contract parity with cv2.imread: None on missing / undecodable input
    assert imread(tmp_path / "missing_不存在.png") is None
    bad = tmp_path / "bad_坏.png"
    bad.write_bytes(b"not an image")
    assert imread(bad) is None
    empty = tmp_path / "empty_空.png"
    empty.write_bytes(b"")
    assert imread(empty) is None
    # imwrite returns False instead of raising on a bad target
    assert not imwrite(tmp_path / "no_dir_目录" / "x.png", img)

    # the dataset loader path consumes imread through load_image
    from yololite_tpu.utils.patches import imshow  # import-time sanity only

    assert callable(imshow)
