from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmgt_tpu.data import dwpose_infer as di


def test_yolox_decode_grid():
    n = 8400  # 80^2 + 40^2 + 20^2
    raw = np.zeros((1, n, 85), np.float32)
    raw[0, 0, :4] = [0.5, 0.5, 0.0, 0.0]  # cell (0,0) stride 8
    out = di.yolox_decode(raw)
    # center = (0 + 0.5) * 8 = 4; size = exp(0)*8 = 8
    np.testing.assert_allclose(out[0, 0, :4], [4, 4, 8, 8], atol=1e-5)
    # last cell of stride-32 level
    raw2 = np.zeros((1, n, 85), np.float32)
    out2 = di.yolox_decode(raw2)
    np.testing.assert_allclose(out2[0, -1, :2], [19 * 32, 19 * 32])


def test_nms_suppresses_overlaps():
    boxes = np.array(
        [[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]], np.float32
    )
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    keep = di.nms(boxes, scores, 0.45)
    assert keep == [0, 2]


def test_detect_person_boxes():
    n = 8400
    raw = np.zeros((1, n, 85), np.float32)
    # one strong person at stride-8 cell (10, 10)
    idx = 10 * 80 + 10
    raw[0, idx, :4] = [0.0, 0.0, np.log(10.0), np.log(20.0)]
    raw[0, idx, 4] = 0.99  # obj
    raw[0, idx, 5] = 0.99  # person cls
    boxes = di.detect_person_boxes(raw, ratio=1.0)
    assert boxes.shape == (1, 4)
    cx, cy = (boxes[0, 0] + boxes[0, 2]) / 2, (boxes[0, 1] + boxes[0, 3]) / 2
    np.testing.assert_allclose([cx, cy], [80, 80], atol=1.0)


def test_simcc_decode():
    sx = np.zeros((1, 3, 100), np.float32)
    sy = np.zeros((1, 3, 120), np.float32)
    sx[0, 0, 40] = 1.0
    sy[0, 0, 60] = 1.0
    sx[0, 1, 10] = 0.5
    sy[0, 1, 20] = 0.5
    # keypoint 2 left at zero -> invalid (-1)
    kpts, scores = di.simcc_decode(sx, sy, 2.0)
    np.testing.assert_allclose(kpts[0, 0], [20, 30])
    np.testing.assert_allclose(scores[0, 0], 1.0)
    np.testing.assert_allclose(kpts[0, 2], [-0.5, -0.5])  # -1 / ratio


def test_to_openpose_134():
    kpts = np.random.default_rng(0).random((1, 133, 2)).astype(np.float32)
    scores = np.full((1, 133), 0.9, np.float32)
    out = di.to_openpose_134(kpts, scores)
    assert out.shape == (1, 134, 3)
    # neck = mean of shoulders (mmpose 5, 6), remapped to openpose idx 1
    np.testing.assert_allclose(
        out[0, 1, :2], (kpts[0, 5] + kpts[0, 6]) / 2, atol=1e-6
    )


def test_bbox_cs_and_aspect():
    c, s = di.bbox_xyxy2cs(np.array([0, 0, 100, 50], np.float32))
    np.testing.assert_allclose(c, [50, 25])
    np.testing.assert_allclose(s, [125, 62.5])
    s2 = di.fix_aspect_ratio(np.array([100.0, 50.0]), 288 / 384)
    assert s2[0] / s2[1] == pytest.approx(288 / 384)


@pytest.mark.slow
def test_dwpose_models_shapes():
    """Fully-convolutional nets checked at reduced spatial size (full 640^2
    YOLOX-L on CPU is prohibitively slow; shapes scale linearly)."""
    from mmgt_tpu.models.dwpose import RTMPose, YOLOXL

    rng = jax.random.PRNGKey(0)
    det = YOLOXL()
    x = jnp.zeros((1, 160, 160, 3))
    variables = det.init(rng, x)
    out = det.apply(variables, x)
    assert out.shape == (1, 20**2 + 10**2 + 5**2, 85)
    # obj/cls sigmoided
    assert float(out[..., 4:].min()) >= 0 and float(out[..., 4:].max()) <= 1

    pose = RTMPose(input_wh=(96, 128))
    crop = jnp.zeros((2, 128, 96, 3))
    pv = pose.init(rng, crop)
    sx, sy = pose.apply(pv, crop)
    assert sx.shape == (2, 133, 192)
    assert sy.shape == (2, 133, 256)


def test_dwpose_detector_end_to_end_stub_models():
    """Full pre/post path with stub network fns (exact-shaped outputs)."""
    rng = np.random.default_rng(0)

    def det_fn(img640):
        raw = np.zeros((1, 8400, 85), np.float32)
        idx = 40 * 80 + 40  # stride-8 cell near (320, 320)
        raw[0, idx, :4] = [0, 0, np.log(120.0), np.log(200.0)]
        raw[0, idx, 4] = 0.95
        raw[0, idx, 5] = 0.95
        return raw

    def pose_fn(crops):
        n = crops.shape[0]
        # every keypoint peaks at the crop center -> maps to bbox center
        sx = np.zeros((n, 133, 576), np.float32)
        sy = np.zeros((n, 133, 768), np.float32)
        sx[:, :, 288] = 1.0
        sy[:, :, 384] = 1.0
        return sx, sy

    d = di.DWPoseDetector(det_fn, pose_fn)
    img = (rng.random((480, 640, 3)) * 255).astype(np.uint8)
    kp = d(img)
    assert kp.shape == (134, 3)
    assert np.isfinite(kp).all()
    # crop-center peaks map back to the detected bbox center (~320, 320)
    np.testing.assert_allclose(kp[0, :2], [320, 320], atol=8)
    assert (kp[:, 2] == 1.0).all()


def test_dwpose_detector_from_onnx(tmp_path):
    """DWPoseDetector.from_onnx runs the whole detect->crop->SimCC path
    through the in-repo ONNX executor on synthetic graphs with the exact
    output geometry of yolox_l.onnx / dw-ll_ucoco_384.onnx."""
    import sys

    sys.path.insert(0, str(Path(__file__).parent))
    from test_onnx_exec import _model_io, _node_a
    from test_onnx_reader import _tensor

    from mmgt_tpu.data.dwpose_infer import DWPoseDetector

    rng = np.random.default_rng(0)

    # --- det graph: (1,3,640,640) -> (1, 8400, 85) over strides 8/16/32
    wdet = (rng.standard_normal((85, 3, 1, 1)) * 0.1).astype(np.float32)
    tensors = [_tensor("w", wdet)]
    nodes, parts = [], []
    for s in (8, 16, 32):
        nodes += [
            _node_a("AveragePool", ["img"], [f"p{s}"],
                    {"kernel_shape": [s, s], "strides": [s, s]}),
            _node_a("Conv", [f"p{s}", "w"], [f"c{s}"], {}),
            _node_a("Reshape", [f"c{s}", f"sh{s}"], [f"r{s}"]),
        ]
        tensors.append(
            _tensor(f"sh{s}", np.asarray([1, 85, (640 // s) ** 2], np.int64))
        )
        parts.append(f"r{s}")
    nodes += [
        _node_a("Concat", parts, ["cat"], {"axis": 2}),
        _node_a("Transpose", ["cat"], ["dets"], {"perm": [0, 2, 1]}),
    ]
    det_blob = _model_io(tensors, nodes, ["img"], ["dets"])

    # --- pose graph: (K,3,384,288) -> simcc_x (K,133,576), simcc_y (K,133,768)
    wx = (rng.standard_normal((3, 133 * 576)) * 0.1).astype(np.float32)
    wy = (rng.standard_normal((3, 133 * 768)) * 0.1).astype(np.float32)
    pose_blob = _model_io(
        [
            _tensor("wx", wx), _tensor("wy", wy),
            _tensor("shx", np.asarray([0, 133, 576], np.int64)),
            _tensor("shy", np.asarray([0, 133, 768], np.int64)),
        ],
        [
            _node_a("GlobalAveragePool", ["crop"], ["g"]),
            _node_a("Flatten", ["g"], ["f"], {"axis": 1}),
            _node_a("MatMul", ["f", "wx"], ["mx"]),
            _node_a("Reshape", ["mx", "shx"], ["simcc_x"]),
            _node_a("MatMul", ["f", "wy"], ["my"]),
            _node_a("Reshape", ["my", "shy"], ["simcc_y"]),
        ],
        ["crop"], ["simcc_x", "simcc_y"],
    )

    dp, pp = tmp_path / "yolox.onnx", tmp_path / "rtmpose.onnx"
    dp.write_bytes(det_blob)
    pp.write_bytes(pose_blob)

    det = DWPoseDetector.from_onnx(str(dp), str(pp))
    img = rng.integers(0, 255, (480, 360, 3)).astype(np.uint8)
    kp = det(img)
    assert kp.shape == (134, 3)
    assert np.isfinite(kp).all()
