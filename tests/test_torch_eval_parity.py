"""Whole-model activation parity for the EVAL towers vs the reference's
actual torch modules (random weights -> ckpt/convert.py -> fp32 agreement):

  - BiSeNet face parser       pretrained/face_parsing/model.py:236-269
  - Hopenet (ResNet-50, 66)   eval_tool/face_vid2vid/modules/hopenet.py
  - D3DFR coeff regressor     eval_tool/Deep3DFaceRecon_pytorch_edit/
                              models/networks.py (ReconNetWrapper, 7-head)

Complements tests/test_torch_model_parity.py (UNet/VAE/CLIP/ArcFace).
"""

import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "ldm")), reason="reference tree absent"
)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

F32 = jnp.float32
ATOL = 3e-4


def _stub(name, **attrs):
    mod = sys.modules.get(name) or types.ModuleType(name)
    if getattr(mod, "__spec__", None) is None:
        import importlib.machinery

        # later importlib.util.find_spec probes (e.g. transformers feature
        # detection) raise on stubs without a __spec__
        mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def _sd(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


def _to_shapes(tree):
    return jax.tree.map(lambda s: np.zeros(s.shape, np.float32), tree)


def _nchw(x):
    return torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))


@pytest.fixture(scope="module")
def ref():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    _stub("torchvision")  # imported (unused at eval) by face_parsing/model.py
    _stub("kornia")  # networks.py: from kornia.geometry import warp_affine
    _stub("kornia.geometry", warp_affine=lambda *a, **k: None)

    import pretrained.face_parsing.resnet as fp_resnet

    # Resnet18.init_weight downloads ImageNet weights — irrelevant for
    # random-weight parity and impossible offline
    fp_resnet.Resnet18.init_weight = lambda self: None

    # face_parsing/model.py calls .cuda() at import time (module-level
    # normalization constants) — CPU-only torch here
    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    try:
        from pretrained.face_parsing.model import BiSeNet as TorchBiSeNet
    finally:
        torch.Tensor.cuda = orig_cuda

    from eval_tool.face_vid2vid.modules.hopenet import Hopenet as TorchHopenet

    # Deep3DFaceRecon's models/__init__.py assumes its repo root on
    # sys.path ('from models.base_model import ...'); load networks.py
    # directly by file path instead
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "d3dfr_networks",
        os.path.join(REF, "eval_tool", "Deep3DFaceRecon_pytorch_edit",
                     "models", "networks.py"),
    )
    networks = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(networks)

    return dict(TorchBiSeNet=TorchBiSeNet, TorchHopenet=TorchHopenet,
                networks=networks)


def test_lpips_whole_model_parity(ref):
    """The reference's LPIPS(alex) classes (eval_tool/lpips/networks.py)
    with random weights -> convert_lpips -> our flax LPIPS, exact forward
    math of lpips.py:29-35 (z-score, taps, unit-normalize, lin, mean, sum)."""
    from reface_tpu.ckpt.convert import convert_lpips
    from reface_tpu.nn.lpips import LPIPS

    tnn = torch.nn
    # torchvision is not installed; build the documented alexnet.features
    # stack and hand it to networks.AlexNet via the torchvision stub
    features = tnn.Sequential(
        tnn.Conv2d(3, 64, 11, 4, 2), tnn.ReLU(True), tnn.MaxPool2d(3, 2),
        tnn.Conv2d(64, 192, 5, 1, 2), tnn.ReLU(True), tnn.MaxPool2d(3, 2),
        tnn.Conv2d(192, 384, 3, 1, 1), tnn.ReLU(True),
        tnn.Conv2d(384, 256, 3, 1, 1), tnn.ReLU(True),
        tnn.Conv2d(256, 256, 3, 1, 1), tnn.ReLU(True), tnn.MaxPool2d(3, 2),
    )
    holder = types.SimpleNamespace(features=features)
    _stub("torchvision.models", alexnet=lambda pretrained=False: holder)
    _stub("torchvision", models=sys.modules["torchvision.models"])

    from eval_tool.lpips import networks as lpips_networks

    torch.manual_seed(3)
    for p in features.parameters():
        p.data.normal_(0, 0.1)
    tnet = lpips_networks.AlexNet().eval()
    tlin = lpips_networks.LinLayers(tnet.n_channels_list).eval()
    for p in tlin.parameters():
        p.data.uniform_(0, 0.2)

    rng = np.random.default_rng(3)
    x = rng.uniform(-1, 1, size=(2, 64, 64, 3)).astype(np.float32)
    y = rng.uniform(-1, 1, size=(2, 64, 64, 3)).astype(np.float32)

    with torch.no_grad():  # lpips.py:29-35 forward math
        fx, fy = tnet(_nchw(x)), tnet(_nchw(y))
        diff = [(a - b) ** 2 for a, b in zip(fx, fy)]
        res = [l(d).mean((2, 3), True) for d, l in zip(diff, tlin)]
        out_t = (torch.sum(torch.cat(res, 0)) / x.shape[0]).item()

    fm = LPIPS()
    sd = {f"net.{k}": v.numpy() for k, v in tnet.state_dict().items()}
    sd.update({f"lin.{k}": v.numpy() for k, v in tlin.state_dict().items()})
    shapes = jax.eval_shape(fm.init, jax.random.key(0), jnp.asarray(x),
                            jnp.asarray(y))
    params = convert_lpips(shapes, sd)
    out_f = float(np.mean(np.asarray(
        fm.apply(params, jnp.asarray(x), jnp.asarray(y))
    )))
    np.testing.assert_allclose(out_f, out_t, atol=ATOL)

    # the official calibration-file layout maps identically
    sd2 = {k: v for k, v in sd.items() if not k.startswith("lin.")}
    sd2.update({f"lin{i}.model.1.weight": tlin.state_dict()[f"{i}.1.weight"].numpy()
                for i in range(5)})
    params2 = convert_lpips(shapes, sd2)
    chex = np.testing.assert_array_equal
    chex(np.asarray(params2["params"]["lin0"]["kernel"]),
         np.asarray(params["params"]["lin0"]["kernel"]))


def test_bisenet_whole_model_parity(ref):
    from reface_tpu.ckpt.convert import convert_bisenet
    from reface_tpu.nn.bisenet import BiSeNet, BiSeNetConfig

    torch.manual_seed(0)
    tm = ref["TorchBiSeNet"](n_classes=19).eval()
    fm = BiSeNet(BiSeNetConfig(dtype=F32))
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, size=(1, 64, 64, 3)).astype(np.float32)

    shapes = jax.eval_shape(fm.init, jax.random.key(0), jnp.asarray(x))
    params = convert_bisenet(_to_shapes(shapes), _sd(tm))

    with torch.no_grad():
        out_t = tm(_nchw(x))[0].numpy().transpose(0, 2, 3, 1)
    out_f = np.asarray(fm.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(out_f, out_t, atol=ATOL)


def test_hopenet_whole_model_parity(ref):
    from reface_tpu.ckpt.convert import convert_hopenet
    from reface_tpu.eval.backbones import Hopenet

    torch.manual_seed(1)
    # pose_compare.py instantiates Hopenet(torchvision Bottleneck, [3,4,6,3],
    # 66); the vendored D3DFR networks.Bottleneck is the same torchvision
    # block (torchvision itself is not installed here)
    tm = ref["TorchHopenet"](ref["networks"].Bottleneck, [3, 4, 6, 3], 66).eval()
    fm = Hopenet(dtype=F32)
    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 224, 224, 3)).astype(np.float32)

    shapes = jax.eval_shape(fm.init, jax.random.key(0), jnp.asarray(x))
    params = convert_hopenet(_to_shapes(shapes), _sd(tm))

    with torch.no_grad():
        yaw_t, pitch_t, roll_t = (o.numpy() for o in tm(_nchw(x)))
    yaw_f, pitch_f, roll_f = (np.asarray(o) for o in fm.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(yaw_f, yaw_t, atol=ATOL)
    np.testing.assert_allclose(pitch_f, pitch_t, atol=ATOL)
    np.testing.assert_allclose(roll_f, roll_t, atol=ATOL)


def test_facerecon_whole_model_parity(ref):
    """ReconNetWrapper with the 7 conv1x1 coefficient heads -> our
    Dense(257) via the concatenating converter."""
    from reface_tpu.ckpt.convert import convert_facerecon
    from reface_tpu.eval.backbones import FaceReconCoeffNet

    torch.manual_seed(2)
    tm = ref["networks"].define_net_recon("resnet50", use_last_fc=False,
                                          init_path=None).eval()
    fm = FaceReconCoeffNet(dtype=F32)
    rng = np.random.default_rng(2)
    x = rng.uniform(0, 1, size=(1, 224, 224, 3)).astype(np.float32)

    shapes = jax.eval_shape(fm.init, jax.random.key(0), jnp.asarray(x))
    params = convert_facerecon(_to_shapes(shapes), _sd(tm),
                               prefix="backbone.", head_prefix="final_layers.")

    with torch.no_grad():
        out_t = tm(_nchw(x)).numpy()
    out_f = np.asarray(fm.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(out_f, out_t, atol=ATOL)
