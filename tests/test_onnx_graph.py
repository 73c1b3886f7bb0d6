"""ONNX graph contract tests: parse -> validate -> execute -> convert.

The reference executes the downloaded ONNX graph (reference
infer_server/src/nn.rs:166-174), so its topology is verified by
construction. These tests close the same gap offline: a REAL
torch.onnx.export of the twin (the only exporter reachable without
network) is parsed by the dependency-free reader, validated+converted
structurally by models/convert.params_from_graph, and executed directly
by models/onnx_exec.GraphExecutor — all three must agree with the torch
twin to float32 exactness, for both export styles (BatchNorm kept vs
constant-folded into renamed initializers).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from infercam_onnx_tpu.models import ultraface as uf  # noqa: E402
from infercam_onnx_tpu.models.convert import (  # noqa: E402
    expected_conv_slots,
    infer_graph_arch,
    params_from_graph,
    params_from_onnx,
    params_from_state_dict,
)
from infercam_onnx_tpu.models.onnx_exec import GraphExecutor  # noqa: E402
from infercam_onnx_tpu.models.onnx_reader import (  # noqa: E402
    read_onnx_graph,
)
from torch_twin import UltraFaceTwin  # noqa: E402


from onnx_export_util import export_onnx  # noqa: E402


def _export(twin, path, width, height, fold):
    export_onnx(twin, path, torch.zeros(1, 3, height, width),
                opset=11, fold=fold, input_names=["input"],
                output_names=["scores", "boxes"])


@pytest.fixture(scope="module")
def twin():
    torch.manual_seed(3)
    return UltraFaceTwin(
        torch.from_numpy(uf.generate_priors(320, 240))).eval()


@pytest.fixture(scope="module")
def exports(twin, tmp_path_factory):
    d = tmp_path_factory.mktemp("onnx")
    paths = {}
    for fold in (True, False):
        p = d / f"rfb320_fold{fold}.onnx"
        _export(twin, p, 320, 240, fold)
        paths[fold] = str(p)
    return paths


@pytest.fixture(scope="module")
def twin_outputs(twin):
    x = np.random.default_rng(7).normal(
        size=(1, 3, 240, 320)).astype(np.float32)
    with torch.no_grad():
        scores, boxes = twin(torch.from_numpy(x))
    return x, scores.numpy(), boxes.numpy()


def test_graph_parse_io_contract(exports):
    for path in exports.values():
        g = read_onnx_graph(path)
        assert [i.shape for i in g.inputs] == [[1, 3, 240, 320]]
        assert [o.shape for o in g.outputs] == [[1, 4420, 2],
                                                [1, 4420, 4]]
        assert infer_graph_arch(g) == "RFB"


@pytest.mark.parametrize("fold", [True, False])
def test_graph_executor_matches_twin(exports, twin_outputs, fold):
    x, want_s, want_b = twin_outputs
    ex = GraphExecutor(read_onnx_graph(exports[fold]))
    s, b = jax.jit(ex)(x)
    np.testing.assert_allclose(np.asarray(s), want_s, atol=1e-5)
    np.testing.assert_allclose(np.asarray(b), want_b, atol=1e-5)


@pytest.mark.parametrize("fold", [True, False])
def test_structural_conversion_matches_twin(exports, twin_outputs, fold):
    x, want_s, want_b = twin_outputs
    params = params_from_onnx(exports[fold])
    s, b = uf.forward(
        params, jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
        jnp.asarray(uf.generate_priors(320, 240)),
        compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(s), want_s, atol=1e-5)
    np.testing.assert_allclose(np.asarray(b), want_b, atol=1e-5)


def test_structural_equals_name_based_conversion(exports, twin):
    # the unfolded export preserves state-dict names, so the structural
    # walk and the name map must recover the SAME parameter pytree
    by_name = params_from_state_dict(
        {k: v.numpy() for k, v in twin.state_dict().items()
         if k != "priors"})
    by_graph = params_from_onnx(exports[False])
    flat_n, _ = jax.tree.flatten(by_name)
    flat_g, _ = jax.tree.flatten(by_graph)
    assert len(flat_n) == len(flat_g)
    for a, b in zip(flat_n, flat_g):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6)


def test_end_to_end_detector_from_onnx_file(exports, rng):
    from infercam_onnx_tpu.config import DetectorConfig
    from infercam_onnx_tpu.detector import Detector

    params = params_from_onnx(exports[True])
    det = Detector(DetectorConfig(variant="RFB-320",
                                  compute_dtype="float32"),
                   params=params)
    frame = rng.integers(0, 256, size=(240, 320, 3), dtype=np.uint8)
    dets = det.detect(frame)  # exercises the whole fused program
    for bbox, conf in dets:
        assert 0.5 < conf <= 1.0
        assert np.all(np.isfinite(bbox))


def test_validator_rejects_wrong_dilation(exports):
    g = read_onnx_graph(exports[False])
    bad = [n for n in g.nodes if n.op_type == "Conv"
           and n.attrs.get("dilations", [1, 1]) == [2, 2]]
    bad[0].attrs["dilations"] = [4, 4]
    with pytest.raises(ValueError, match="dilations"):
        params_from_graph(g)


def test_validator_rejects_wrong_conv_count(exports):
    g = read_onnx_graph(exports[False])
    g.nodes.remove(next(n for n in g.nodes if n.op_type == "Conv"))
    with pytest.raises(ValueError, match="Conv nodes"):
        params_from_graph(g)


def test_validator_rejects_wrong_pads(exports):
    g = read_onnx_graph(exports[False])
    conv0 = next(n for n in g.nodes if n.op_type == "Conv")
    conv0.attrs["pads"] = [0, 0, 0, 0]
    with pytest.raises(ValueError, match="pads"):
        params_from_graph(g)


def test_expected_slots_counts():
    # 2 convs per conv_dw block x 12 + first conv + 12 RFB convs +
    # 3 extras + 4 levels x (cls + reg): 3 levels separable (2 each) +
    # 1 plain
    rfb = expected_conv_slots("RFB")
    slim = expected_conv_slots("slim")
    assert len(rfb) == 52
    assert len(slim) == 42
    assert len({s.path for s in rfb}) == len(rfb)


def test_slim_export_roundtrip(rng):
    torch.manual_seed(4)
    slim = UltraFaceTwin(
        torch.from_numpy(uf.generate_priors(320, 240)),
        arch="slim").eval()
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/slim.onnx"
        _export(slim, path, 320, 240, True)
        g = read_onnx_graph(path)
        assert infer_graph_arch(g) == "slim"
        params = params_from_graph(g)
    x = rng.normal(size=(1, 3, 240, 320)).astype(np.float32)
    with torch.no_grad():
        want_s, want_b = slim(torch.from_numpy(x))
    s, b = uf.forward(
        params, jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
        jnp.asarray(uf.generate_priors(320, 240)),
        compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(s), want_s.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(b), want_b.numpy(), atol=1e-5)


def test_graph_detector_matches_native_detector(exports, rng):
    """The interpreted-graph runtime (GraphDetector) and the native
    forward with structurally-converted weights produce the same
    detections end-to-end — tract-parity as a product path, batch > 1
    included (the folded export's Reshape constants pin batch 1; the
    runtime vmaps over the batch)."""
    from infercam_onnx_tpu.config import DetectorConfig
    from infercam_onnx_tpu.detector import Detector
    from infercam_onnx_tpu.models.onnx_exec import GraphDetector

    cfg = DetectorConfig(variant="RFB-320", compute_dtype="float32")
    native = Detector(cfg, params=params_from_onnx(exports[True]))
    graph = GraphDetector(exports[True], cfg)
    frames = rng.integers(0, 256, size=(2, 240, 320, 3), dtype=np.uint8)
    a = native.detect_batch(frames)
    b = graph.detect_batch(frames)
    assert [len(x) for x in a] == [len(x) for x in b]
    for da, db in zip(a, b):
        for (box_a, conf_a), (box_b, conf_b) in zip(da, db):
            np.testing.assert_allclose(box_a, box_b, atol=1e-4)
            assert abs(conf_a - conf_b) < 1e-4


def test_graph_detector_cli(exports, tmp_path, rng):
    from infercam_onnx_tpu import codec, detect

    frame = rng.integers(0, 256, size=(120, 160, 3), dtype=np.uint8)
    img = tmp_path / "in.jpg"
    img.write_bytes(codec.encode_rgb(frame))
    out = tmp_path / "out.jpg"
    rc = detect.main([str(img), "-o", str(out), "--onnx", exports[True],
                      "--runtime", "graph", "--variant", "RFB-320"])
    assert rc == 0 and out.is_file()


def test_serve_cli_validates_graph_runtime_flags(exports):
    from infercam_onnx_tpu import serve

    with pytest.raises(SystemExit):
        serve.main(["--runtime", "graph"])  # requires --onnx
    with pytest.raises(SystemExit):
        serve.main(["--runtime", "graph", "--onnx", exports[True],
                    "--tile-min-pixels", "100000"])  # no tiling


def test_graph_detector_serves_mjpeg(exports, rng, tmp_path):
    """The interpreted-graph runtime plugs into the full serving stack:
    live frames in, annotated MJPEG out."""
    import asyncio

    from infercam_onnx_tpu import codec
    from infercam_onnx_tpu.client.sender import ReplaySource, send_stream
    from infercam_onnx_tpu.config import (
        ClientConfig,
        DetectorConfig,
        EngineConfig,
        ServerConfig,
    )
    from infercam_onnx_tpu.models.onnx_exec import GraphDetector
    from infercam_onnx_tpu.serving.app import start_server

    frame = rng.integers(0, 256, size=(48, 64, 3), dtype=np.uint8)
    (tmp_path / "f.jpg").write_bytes(codec.encode_rgb(frame))
    det = GraphDetector(
        exports[True],
        DetectorConfig(variant="RFB-320", compute_dtype="float32"))

    async def run():
        server = await start_server(
            server_config=ServerConfig(
                http_address="127.0.0.1:18380",
                socket_address="127.0.0.1:18381"),
            engine_config=EngineConfig(batch_buckets=(1, 2),
                                       batch_window_ms=5.0),
            detector=det, data_parallel="off")
        try:
            reader, writer = await asyncio.open_connection(
                "127.0.0.1", 18380)
            writer.write(b"GET /face_stream?name=g HTTP/1.1\r\n"
                         b"Host: x\r\n\r\n")
            await writer.drain()
            await asyncio.sleep(0.2)
            await send_stream(
                ReplaySource(str(tmp_path), fps=10),
                ClientConfig(address="127.0.0.1:18381", channel="g"),
                max_frames=8)
            data = b""
            try:
                while data.count(b"--frame") < 1:
                    data += await asyncio.wait_for(reader.read(4096),
                                                   60.0)
            except asyncio.TimeoutError:
                pass
            assert data.count(b"--frame") >= 1, data[:200]
            writer.close()
        finally:
            await server.close()

    asyncio.run(run())


def test_graph_detector_shards_over_mesh(exports, rng):
    """Arbitrary-graph data-parallel serving: the mesh-aware
    GraphDetector's batch shards over the 8-device mesh and equals the
    single-device runtime (incl. the pad-and-slice path for batches
    that don't divide the mesh)."""
    from infercam_onnx_tpu.config import DetectorConfig
    from infercam_onnx_tpu.models.onnx_exec import GraphDetector
    from infercam_onnx_tpu.parallel.mesh import make_mesh

    cfg = DetectorConfig(variant="RFB-320", compute_dtype="float32")
    single = GraphDetector(exports[True], cfg)
    sharded = single.to_mesh(make_mesh(8))
    assert sharded.batch_granularity == 8
    frames = rng.integers(0, 256, size=(3, 120, 160, 3), dtype=np.uint8)
    a = np.asarray(single.run_device(frames, pack_output=True))
    b = np.asarray(sharded.run_device(frames, pack_output=True))
    assert a.shape == b.shape
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_graph_detector_data_parallel_serving(exports, rng, tmp_path):
    """start_server auto-binds the graph runtime to the visible mesh
    and live frames shard across it."""
    import asyncio

    from infercam_onnx_tpu import codec
    from infercam_onnx_tpu.client.sender import ReplaySource, send_stream
    from infercam_onnx_tpu.config import (
        ClientConfig,
        DetectorConfig,
        EngineConfig,
        ServerConfig,
    )
    from infercam_onnx_tpu.models.onnx_exec import GraphDetector
    from infercam_onnx_tpu.serving.app import start_server

    frame = rng.integers(0, 256, size=(48, 64, 3), dtype=np.uint8)
    (tmp_path / "f.jpg").write_bytes(codec.encode_rgb(frame))
    det = GraphDetector(
        exports[True],
        DetectorConfig(variant="RFB-320", compute_dtype="float32"))

    async def run():
        server = await start_server(
            server_config=ServerConfig(
                http_address="127.0.0.1:18390",
                socket_address="127.0.0.1:18391"),
            engine_config=EngineConfig(batch_buckets=(1, 8),
                                       batch_window_ms=5.0),
            detector=det, data_parallel="on")
        worker_det = server.worker._detector
        assert isinstance(worker_det, GraphDetector)
        assert worker_det.mesh is not None
        try:
            reader, writer = await asyncio.open_connection(
                "127.0.0.1", 18390)
            writer.write(b"GET /face_stream?name=g HTTP/1.1\r\n"
                         b"Host: x\r\n\r\n")
            await writer.drain()
            await asyncio.sleep(0.2)
            await send_stream(
                ReplaySource(str(tmp_path), fps=10),
                ClientConfig(address="127.0.0.1:18391", channel="g"),
                max_frames=8)
            data = b""
            try:
                while data.count(b"--frame") < 1:
                    data += await asyncio.wait_for(reader.read(4096),
                                                   60.0)
            except asyncio.TimeoutError:
                pass
            assert data.count(b"--frame") >= 1, data[:200]
            writer.close()
        finally:
            await server.close()

    asyncio.run(run())


def test_graph_detector_device_decode_tails(exports, rng):
    """The transfer-optimal decode modes work for graph models too:
    ycbcr packed planes and DCT coefficients produce the same
    detections as pixel decode of the same JPEGs."""
    from infercam_onnx_tpu import codec
    from infercam_onnx_tpu.config import DetectorConfig
    from infercam_onnx_tpu.models.onnx_exec import GraphDetector
    from infercam_onnx_tpu.native import jpeg as native_jpeg
    from infercam_onnx_tpu.ops.jpeg_device import read_coefficient_batch

    det = GraphDetector(
        exports[True],
        DetectorConfig(variant="RFB-320", compute_dtype="float32"))
    datas = [codec.encode_rgb(
        rng.integers(0, 256, size=(48, 64, 3), dtype=np.uint8),
        90, "420") for _ in range(2)]

    pixels = np.stack([codec.decode_rgb(d) for d in datas])
    want = np.asarray(det.run_device(pixels, pack_output=True))

    packed, geom = native_jpeg.load().decode_ycbcr_batch(datas)
    got_y = np.asarray(det.run_device_ycbcr_packed(
        packed, geom, pack_output=True))
    y, cb, cr, q, wh, samp = read_coefficient_batch(datas)
    got_c = np.asarray(det.run_device_coefficients_arrays(
        y, cb, cr, q, wh, sampling=samp, pack_output=True))

    # the decode tails reproduce libjpeg's pixel output to rounding;
    # detections agree to tight tolerance
    for got in (got_y, got_c):
        assert got.shape == want.shape
        np.testing.assert_allclose(got[..., 5], want[..., 5])  # counts
        np.testing.assert_allclose(got, want, atol=2e-2)


def test_graph_detector_device_annotate(exports, rng):
    """The device-annotate encode tail composes with the interpreted
    graph runtime too: overlay + FDCT/quant fused behind the graph
    forward, detections identical to the detection-only programs."""
    from infercam_onnx_tpu import codec
    from infercam_onnx_tpu.config import DetectorConfig
    from infercam_onnx_tpu.models.onnx_exec import GraphDetector
    from infercam_onnx_tpu.native import jpeg as native_jpeg
    from infercam_onnx_tpu.ops.jpeg_encode_device import split_coefs

    det = GraphDetector(
        exports[True],
        DetectorConfig(variant="RFB-320", compute_dtype="float32"))
    native = native_jpeg.load()
    datas = [codec.encode_rgb(
        rng.integers(0, 256, size=(48, 64, 3), dtype=np.uint8),
        90, "420") for _ in range(2)]
    packed, geom = native.decode_ycbcr_batch(datas)

    coefs, pdet = det.run_device_ycbcr_annotated(packed, geom,
                                                 quality=95)
    coefs, pdet = np.asarray(coefs), np.asarray(pdet)
    want = np.asarray(det.run_device_ycbcr_packed(
        packed, geom, pack_output=True))
    np.testing.assert_allclose(pdet, want, atol=1e-5)
    yq, cbq, crq = split_coefs(coefs[0], geom)
    jpg = native.encode_coefs(yq, cbq, crq, (64, 48), (2, 2),
                              native.quant_tables(95))
    img = codec.decode_rgb(jpg)
    assert img.shape == (48, 64, 3)
    if int(pdet[0, :, 5].sum()):
        g = img[..., 1].astype(int)
        assert (((g - img[..., 0]) > 60)
                & ((g - img[..., 2]) > 60)).sum() > 0

    # RGB-input variant (pixels decode mode)
    pixels = np.stack([codec.decode_rgb(d) for d in datas])
    coefs2, pdet2 = det.run_device_annotated(pixels, quality=95)
    want2 = np.asarray(det.run_device(pixels, pack_output=True))
    np.testing.assert_allclose(np.asarray(pdet2), want2, atol=1e-5)


def test_graph_detector_serves_ycbcr_detections(exports, rng,
                                                tmp_path):
    """The graph runtime serves through the transfer-optimal ycbcr
    decode tail end-to-end: live frames in, NDJSON detections out,
    pixels never materialized on the host."""
    import asyncio
    import json

    from infercam_onnx_tpu import codec
    from infercam_onnx_tpu.client.sender import ReplaySource, send_stream
    from infercam_onnx_tpu.config import (
        ClientConfig,
        DetectorConfig,
        EngineConfig,
        ServerConfig,
    )
    from infercam_onnx_tpu.models.onnx_exec import GraphDetector
    from infercam_onnx_tpu.serving.app import start_server

    frame = rng.integers(0, 256, size=(48, 64, 3), dtype=np.uint8)
    (tmp_path / "f.jpg").write_bytes(codec.encode_rgb(frame, 90,
                                                      "420"))
    det = GraphDetector(
        exports[True],
        DetectorConfig(variant="RFB-320", compute_dtype="float32"))

    async def run():
        server = await start_server(
            server_config=ServerConfig(
                http_address="127.0.0.1:18394",
                socket_address="127.0.0.1:18395"),
            engine_config=EngineConfig(batch_buckets=(1, 2),
                                       batch_window_ms=5.0,
                                       decode_mode="ycbcr"),
            detector=det, data_parallel="off")
        try:
            reader, writer = await asyncio.open_connection(
                "127.0.0.1", 18394)
            writer.write(b"GET /detections?name=g HTTP/1.1\r\n"
                         b"Host: x\r\n\r\n")
            await writer.drain()
            await asyncio.sleep(0.2)
            sender = asyncio.create_task(send_stream(
                ReplaySource(str(tmp_path), fps=10),
                ClientConfig(address="127.0.0.1:18395", channel="g"),
                max_frames=40))
            data = b""
            try:
                while b"\n" not in data.split(b"\r\n\r\n", 1)[-1]:
                    data += await asyncio.wait_for(reader.read(4096),
                                                   60.0)
            except asyncio.TimeoutError:
                pass
            sender.cancel()
            body = data.split(b"\r\n\r\n", 1)[1]
            line = body.split(b"\n")[0]
            rec = json.loads(line)
            assert rec["width"] == 64 and rec["height"] == 48
            writer.close()
        finally:
            await server.close()

    asyncio.run(run())


def test_graph_detector_unfolded_export_with_bn_nodes(exports, rng):
    """GraphDetector with an export that KEEPS BatchNormalization nodes:
    the BN statistics are traced jit arguments, exercising the
    dtype-module-agnostic BN implementation."""
    from infercam_onnx_tpu.config import DetectorConfig
    from infercam_onnx_tpu.detector import Detector
    from infercam_onnx_tpu.models.onnx_exec import GraphDetector

    cfg = DetectorConfig(variant="RFB-320", compute_dtype="float32")
    native = Detector(cfg, params=params_from_onnx(exports[False]))
    graph = GraphDetector(exports[False], cfg)
    frames = rng.integers(0, 256, size=(1, 120, 160, 3), dtype=np.uint8)
    a = native.detect_batch(frames)[0]
    b = graph.detect_batch(frames)[0]
    assert len(a) == len(b)
    for (box_a, conf_a), (box_b, conf_b) in zip(a, b):
        np.testing.assert_allclose(box_a, box_b, atol=1e-4)
        assert abs(conf_a - conf_b) < 1e-4


def test_onnx_reader_rejects_garbage_cleanly(tmp_path, rng):
    for i in range(30):
        blob = bytes(rng.integers(0, 256,
                                  size=int(rng.integers(0, 4096)),
                                  dtype=np.uint8))
        path = tmp_path / f"junk{i}.onnx"
        path.write_bytes(blob)
        with pytest.raises(ValueError):
            read_onnx_graph(str(path))


def test_onnx_reader_mutation_fuzz(exports, tmp_path):
    """Deep-path fuzz: byte flips and truncations of a VALID export
    must either parse or raise ValueError — never hang, crash, or leak
    parser internals (IndexError/struct.error/RecursionError)."""
    data = open(exports[True], "rb").read()
    rng = np.random.default_rng(60)
    for i in range(120):
        blob = bytearray(data)
        kind = i % 3
        if kind == 0:  # truncate
            blob = blob[:int(rng.integers(1, len(blob)))]
        elif kind == 1:  # flip a handful of bytes
            for _ in range(int(rng.integers(1, 8))):
                blob[int(rng.integers(0, len(blob)))] = int(
                    rng.integers(0, 256))
        else:  # splice a random chunk over a random offset
            off = int(rng.integers(0, len(blob) - 16))
            blob[off:off + 16] = bytes(
                rng.integers(0, 256, size=16, dtype=np.uint8))
        path = tmp_path / "mut.onnx"
        path.write_bytes(bytes(blob))
        try:
            read_onnx_graph(str(path))
        except ValueError:
            pass


@pytest.mark.parametrize("fold", [True, False])
@pytest.mark.parametrize("arch", ["RFB", "slim"])
def test_structural_conversion_accepts_upstream_interleaved_order(
        twin, tmp_path, fold, arch):
    """The GENUINE upstream SSD traces each level's head convs AT its
    source layer (source_layer_indexes=[8,11,13]), interleaving them
    with backbone convs — a different node order than the grouped
    forward every other test exports. The structural converter must
    load that order too (it is the order the real version-RFB
    artifacts contain)."""
    torch.manual_seed(3)
    if arch == "RFB":
        inter = UltraFaceTwin(torch.as_tensor(
            uf.generate_priors(320, 240)), interleaved=True)
        inter.load_state_dict(twin.state_dict())
    else:
        inter = UltraFaceTwin(torch.as_tensor(
            uf.generate_priors(320, 240)), arch="slim",
            interleaved=True)
    inter = inter.eval()
    path = tmp_path / f"inter_{arch}_{fold}.onnx"
    _export(inter, path, 320, 240, fold)
    params = params_from_onnx(str(path))
    x = np.random.default_rng(7).normal(
        size=(1, 3, 240, 320)).astype(np.float32)
    with torch.no_grad():
        w_scores, w_boxes = inter(torch.from_numpy(x))
    scores, boxes = uf.forward(
        params, jnp.transpose(jnp.asarray(x), (0, 2, 3, 1)),
        jnp.asarray(uf.generate_priors(320, 240)),
        compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(scores), w_scores.numpy(),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(boxes), w_boxes.numpy(),
                               atol=2e-5)


# -- quantized (QDQ int8) detector through the live server --------------
# The reference's contract is "run any downloaded graph" (reference
# infer_server/src/nn.rs:166-174); int8 QDQ exports are the form real
# edge detectors ship. The executor's quantized op family is op- and
# model-pinned in test_onnx_exec_ops.py; these tests close the loop at
# the product surface: a statically-quantized UltraFace export serves
# live MJPEG requests through the full stack.


@pytest.fixture(scope="module")
def qdq_export(twin, tmp_path_factory):
    """FX-mode static quantization of the twin's conv stack (fbgemm,
    per-channel int8 weights), decode tail left float — the standard
    edge QDQ layout — exported at opset 13."""
    import warnings

    from onnx_export_util import export_onnx

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        from torch.ao.quantization import (
            QConfigMapping,
            get_default_qconfig,
            quantize_fx,
        )

        qc = get_default_qconfig("fbgemm")
        qmap = (QConfigMapping()
                .set_object_type(torch.nn.Conv2d, qc)
                .set_object_type(torch.nn.ReLU, qc)
                .set_object_type(torch.nn.BatchNorm2d, qc))
        ex_in = torch.randn(1, 3, 240, 320)
        prepared = quantize_fx.prepare_fx(twin, qmap, (ex_in,))
        torch.manual_seed(11)
        for _ in range(3):  # calibrate observers
            prepared(torch.randn(1, 3, 240, 320))
        quant = quantize_fx.convert_fx(prepared)

        path = tmp_path_factory.mktemp("onnx") / "rfb320_qdq.onnx"
        export_onnx(quant, path, ex_in, opset=13,
                    input_names=["input"],
                    output_names=["scores", "boxes"])
        x = np.random.default_rng(13).normal(
            size=(1, 3, 240, 320)).astype(np.float32)
        with torch.no_grad():
            want_s, want_b = quant(torch.from_numpy(x))
    return str(path), x, want_s.numpy(), want_b.numpy()


def test_qdq_detector_export_parity(qdq_export):
    """The QDQ export is a genuine int8 graph and the executor matches
    the torch quantized (fbgemm integer-kernel) forward. Tolerance is
    float-simulation-vs-integer-kernel rounding, far below the 0.5
    confidence threshold and box-pixel scale."""
    path, x, want_s, want_b = qdq_export
    g = read_onnx_graph(path)
    ops = {n.op_type for n in g.nodes}
    assert {"QuantizeLinear", "DequantizeLinear", "Conv"} <= ops, ops
    s, b = GraphExecutor(g)(x)
    np.testing.assert_allclose(np.asarray(s), want_s, atol=2e-3)
    np.testing.assert_allclose(np.asarray(b), want_b, atol=2e-3)


def test_qdq_detector_serves_mjpeg(qdq_export, rng, tmp_path):
    """serve-path e2e for the int8 graph (VERDICT r04 item 8): the
    QDQ-quantized detector export plugs into the live serving stack —
    real MJPEG frames in over the data socket, annotated MJPEG parts
    out of /face_stream, and /stats reports the inference traffic."""
    import asyncio
    import json

    from infercam_onnx_tpu import codec
    from infercam_onnx_tpu.client.sender import ReplaySource, send_stream
    from infercam_onnx_tpu.config import (
        ClientConfig,
        DetectorConfig,
        EngineConfig,
        ServerConfig,
    )
    from infercam_onnx_tpu.models.onnx_exec import GraphDetector
    from infercam_onnx_tpu.serving.app import start_server

    path, _, _, _ = qdq_export
    frame = rng.integers(0, 256, size=(48, 64, 3), dtype=np.uint8)
    (tmp_path / "f.jpg").write_bytes(codec.encode_rgb(frame))
    det = GraphDetector(
        path, DetectorConfig(variant="RFB-320",
                             compute_dtype="float32"))

    async def http_get(port, req_path, max_bytes=None):
        reader, writer = await asyncio.open_connection("127.0.0.1",
                                                       port)
        writer.write(f"GET {req_path} HTTP/1.1\r\nHost: x\r\n"
                     "Connection: close\r\n\r\n".encode())
        await writer.drain()
        data = b""
        try:
            while max_bytes is None or len(data) < max_bytes:
                chunk = await asyncio.wait_for(reader.read(4096), 60.0)
                if not chunk:
                    break
                data += chunk
                if max_bytes is not None and data.count(b"--frame") >= 1:
                    break
        except asyncio.TimeoutError:
            pass
        writer.close()
        return data

    async def run():
        server = await start_server(
            server_config=ServerConfig(
                http_address="127.0.0.1:18386",
                socket_address="127.0.0.1:18387"),
            engine_config=EngineConfig(batch_buckets=(1, 2),
                                       batch_window_ms=5.0),
            detector=det, data_parallel="off")
        try:
            stream_task = asyncio.create_task(
                http_get(18386, "/face_stream?name=q",
                         max_bytes=512 * 1024))
            await asyncio.sleep(0.2)
            await send_stream(
                ReplaySource(str(tmp_path), fps=10),
                ClientConfig(address="127.0.0.1:18387", channel="q"),
                max_frames=8)
            data = await stream_task
            assert data.count(b"--frame") >= 1, data[:200]
            assert b"\xff\xd8\xff" in data  # a real JPEG part came out
            deadline = asyncio.get_running_loop().time() + 15.0
            body = {}
            while asyncio.get_running_loop().time() < deadline:
                stats = await http_get(18386, "/stats")
                body = json.loads(stats.split(b"\r\n\r\n", 1)[1])
                if body["totals"].get("inferred_unique", 0) >= 1:
                    break
                await asyncio.sleep(0.3)
            assert body["totals"]["inferred_unique"] >= 1, body
        finally:
            await server.close()

    asyncio.run(run())
