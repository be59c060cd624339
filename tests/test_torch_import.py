"""Golden tests for torch->flax weight conversion.

Each converter is validated end-to-end: a randomly-initialized torch-format
state dict is converted and the flax forward must reproduce a torch
functional forward of the same architecture to float tolerance. This is
the guard for pretrained-parity runs (ImageNet resnet18 encoder,
monocular/nnutils/mesh_net.py:87-95; LPIPS AlexNet, loss_utils.py:361-363).
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from acfm_video_3d_reconstruction_tpu.models import torch_import  # noqa: E402
from acfm_video_3d_reconstruction_tpu.models.encoder import ResNet18  # noqa: E402
from acfm_video_3d_reconstruction_tpu.models.lpips import AlexNetFeatures  # noqa: E402


# ---------------------------------------------------------------------------
# torchvision-format random state dicts + torch functional forwards
# ---------------------------------------------------------------------------

def _t(rng, *shape):
    return torch.tensor(rng.standard_normal(shape).astype(np.float32) * 0.1)


def make_resnet18_state_dict(rng):
    sd = {}

    def add_bn(prefix, ch):
        sd[f"{prefix}.weight"] = _t(rng, ch).abs() + 0.5
        sd[f"{prefix}.bias"] = _t(rng, ch)
        sd[f"{prefix}.running_mean"] = _t(rng, ch)
        sd[f"{prefix}.running_var"] = _t(rng, ch).abs() + 0.5

    sd["conv1.weight"] = _t(rng, 64, 3, 7, 7)
    add_bn("bn1", 64)
    chans = [64, 128, 256, 512]
    in_ch = 64
    for layer, ch in enumerate(chans, start=1):
        for block in range(2):
            p = f"layer{layer}.{block}"
            stride_in = in_ch if block == 0 else ch
            sd[f"{p}.conv1.weight"] = _t(rng, ch, stride_in, 3, 3)
            add_bn(f"{p}.bn1", ch)
            sd[f"{p}.conv2.weight"] = _t(rng, ch, ch, 3, 3)
            add_bn(f"{p}.bn2", ch)
            if block == 0 and layer > 1:
                sd[f"{p}.downsample.0.weight"] = _t(rng, ch, in_ch, 1, 1)
                add_bn(f"{p}.downsample.1", ch)
        in_ch = ch
    return sd


def torch_resnet18_forward(sd, x):
    """Functional torchvision resnet18 trunk (eval mode) from a state dict."""

    def bn(x, p):
        return F.batch_norm(
            x, sd[f"{p}.running_mean"], sd[f"{p}.running_var"],
            sd[f"{p}.weight"], sd[f"{p}.bias"], training=False,
        )

    x = F.conv2d(x, sd["conv1.weight"], stride=2, padding=3)
    x = F.relu(bn(x, "bn1"))
    x = F.max_pool2d(x, 3, stride=2, padding=1)
    for layer in range(1, 5):
        for block in range(2):
            p = f"layer{layer}.{block}"
            identity = x
            out = F.conv2d(
                x, sd[f"{p}.conv1.weight"],
                stride=2 if (block == 0 and layer > 1) else 1, padding=1,
            )
            out = F.relu(bn(out, f"{p}.bn1"))
            out = F.conv2d(out, sd[f"{p}.conv2.weight"], padding=1)
            out = bn(out, f"{p}.bn2")
            if f"{p}.downsample.0.weight" in sd:
                identity = bn(
                    F.conv2d(x, sd[f"{p}.downsample.0.weight"], stride=2),
                    f"{p}.downsample.1",
                )
            x = F.relu(out + identity)
    return x


def test_resnet18_conversion_matches_torch():
    rng = np.random.default_rng(0)
    sd = make_resnet18_state_dict(rng)
    x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref = torch_resnet18_forward(
            sd, torch.tensor(np.transpose(x, (0, 3, 1, 2)))
        ).numpy()
    ref = np.transpose(ref, (0, 2, 3, 1))

    params, stats = torch_import.convert_resnet18(
        {k: v.numpy() for k, v in sd.items()}
    )
    model = ResNet18()
    out = model.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params),
         "batch_stats": jax.tree_util.tree_map(jnp.asarray, stats)},
        jnp.asarray(x), train=False,
    )
    assert out.shape == ref.shape
    # random 0.1-scale weights blow activations up to ~1e5 over 18 convs;
    # XLA/torch accumulation-order differences leave ~1e-2 relative noise
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-2, atol=0.5)


def make_alexnet_state_dict(rng):
    shapes = [
        (64, 3, 11, 11), (192, 64, 5, 5), (384, 192, 3, 3),
        (256, 384, 3, 3), (256, 256, 3, 3),
    ]
    idx = [0, 3, 6, 8, 10]
    sd = {}
    for t, shp in zip(idx, shapes):
        sd[f"features.{t}.weight"] = _t(rng, *shp)
        sd[f"features.{t}.bias"] = _t(rng, shp[0])
    return sd


def torch_alexnet_features(sd, x):
    """torchvision AlexNet .features forward, returning all conv outputs."""
    idx = [0, 3, 6, 8, 10]
    geoms = [(4, 2), (1, 2), (1, 1), (1, 1), (1, 1)]
    feats = []
    for i, (t, (s, p)) in enumerate(zip(idx, geoms)):
        x = F.conv2d(x, sd[f"features.{t}.weight"], sd[f"features.{t}.bias"],
                     stride=s, padding=p)
        x = F.relu(x)
        feats.append(x)
        if i in (0, 1):
            x = F.max_pool2d(x, 3, 2)
    return feats


def test_alexnet_conversion_matches_torch():
    rng = np.random.default_rng(1)
    sd = make_alexnet_state_dict(rng)
    x = rng.standard_normal((1, 96, 96, 3)).astype(np.float32)
    with torch.no_grad():
        refs = torch_alexnet_features(
            sd, torch.tensor(np.transpose(x, (0, 3, 1, 2)))
        )
    params = torch_import.convert_alexnet_features(
        {k: v.numpy() for k, v in sd.items()}
    )
    model = AlexNetFeatures()
    outs = model.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)}, jnp.asarray(x)
    )
    assert len(outs) == len(refs)
    for out, ref in zip(outs, refs):
        ref = np.transpose(ref.numpy(), (0, 2, 3, 1))
        assert out.shape == ref.shape
        np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-3, atol=2e-3)


def test_maybe_load_pretrained_encoder_merges_into_meshnet(tmp_path):
    """The CLI-facing loader merges a saved torch resnet18 into a real
    MeshNet parameter tree (shape-checked), changing the encoder trunk."""
    from acfm_video_3d_reconstruction_tpu.models import build_template
    from acfm_video_3d_reconstruction_tpu.models.mesh_net import MeshNet

    rng = np.random.default_rng(2)
    sd = make_resnet18_state_dict(rng)
    path = tmp_path / "resnet18.pth"
    torch.save(sd, str(path))

    template = build_template(subdivide=1, num_lbs=6, tex_size=2, num_kps=0)
    model = MeshNet(template=template, nz_feat=32, predict_texture=False)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), method=model.init_all
    )
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    before = np.asarray(params["encoder"]["resnet"]["conv1"]["kernel"]).copy()

    new_params, new_stats, ok = torch_import.maybe_load_pretrained_encoder(
        params, stats, str(path)
    )
    assert ok
    after = np.asarray(new_params["encoder"]["resnet"]["conv1"]["kernel"])
    assert not np.allclose(before, after)
    expected = np.transpose(sd["conv1.weight"].numpy(), (2, 3, 1, 0))
    np.testing.assert_allclose(after, expected, atol=1e-6)
    # missing path -> no-op, ok=False
    _, _, ok2 = torch_import.maybe_load_pretrained_encoder(
        params, stats, str(tmp_path / "nope.pth")
    )
    assert not ok2
