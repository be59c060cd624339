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


# ---------------------------------------------------------------------------
# Full reference pred_net_<epoch>.pth MeshNet checkpoint import
# ---------------------------------------------------------------------------

def make_meshnet_state_dict(rng, template, nz_feat=48, multiframe=False,
                            texture=True, img_size=256):
    """Random state dict in the exact key layout the reference saves
    (monocular/nnutils/train_utils.py:83-89 dumps MeshNet.state_dict() of
    mesh_net.py:294-470; multiframe adds LayerNorm in the camera FC blocks)."""
    V = template.mean_v_init.shape[0]
    K = template.num_lbs
    sd = {f"encoder.resnet_conv.resnet.{k}": v
          for k, v in make_resnet18_state_dict(rng).items()}

    def add_bn(prefix, ch):
        sd[f"{prefix}.weight"] = _t(rng, ch).abs() + 0.5
        sd[f"{prefix}.bias"] = _t(rng, ch)
        sd[f"{prefix}.running_mean"] = _t(rng, ch)
        sd[f"{prefix}.running_var"] = _t(rng, ch).abs() + 0.5

    def add_linear(prefix, nin, nout, bias=True):
        sd[f"{prefix}.weight"] = _t(rng, nout, nin)
        if bias:
            sd[f"{prefix}.bias"] = _t(rng, nout)

    sd["mean_v"] = _t(rng, V, 3)
    sd["lbs"] = _t(rng, template.lbs_logits.shape[0], K)
    sd["vert2kp"] = _t(rng, *template.vert2kp_logits.shape)

    sd["encoder.enc_conv1.0.weight"] = _t(rng, 256, 512, 4, 4)
    sd["encoder.enc_conv1.0.bias"] = _t(rng, 256)
    add_bn("encoder.enc_conv1.1", 256)
    side = img_size // 64
    nc_in = 256 * side * side
    add_linear("encoder.enc_fc.0.0", nc_in, nz_feat)
    add_bn("encoder.enc_fc.0.1", nz_feat)
    add_linear("encoder.enc_fc.1.0", nz_feat, nz_feat)
    add_bn("encoder.enc_fc.1.1", nz_feat)

    # CodePredictor: only final_layer_trans is live in the reference forward
    # (mesh_net.py:255-265); angles head + dead sub-predictors included to
    # prove the importer tolerates them.
    add_linear("code_predictor.transform_predictor.final_layer_trans",
               nz_feat, K * 3)
    sd["code_predictor.transform_predictor.final_layer_angles.weight"] = (
        _t(rng, K * 3, nz_feat))
    add_linear("code_predictor.quat_predictor.pred_layer", 200, 4)
    add_linear("code_predictor.scale_predictor.pred_layer", nz_feat, 1)
    add_linear("code_predictor.trans_predictor.pred_layer", nz_feat, 2)

    sd["camera_predictor.conv_c.0.weight"] = _t(rng, 200, 256, 4, 4)
    sd["camera_predictor.conv_c.0.bias"] = _t(rng, 200)
    for i in (1, 2):
        add_linear(f"camera_predictor.fc{i}.0", 200, 200)
        if multiframe:
            sd[f"camera_predictor.fc{i}.1.weight"] = _t(rng, 200).abs() + 0.5
            sd[f"camera_predictor.fc{i}.1.bias"] = _t(rng, 200)
    add_linear("camera_predictor.quat_predictor.pred_layer", 200, 4)
    add_linear("camera_predictor.scale_predictor.pred_layer", 200, 1)
    add_linear("camera_predictor.trans_predictor.pred_layer", 200, 2)

    if texture:
        # res_color_net Sequential slots (mesh_net.py:157-164):
        # ResLayer_2d at 0,2,3,5,7,9,11; conv3x3(16,3) at 12.
        chans = [(256, 256), (256, 256), (256, 256), (256, 128),
                 (128, 64), (64, 32), (32, 16)]
        for t, (cin, cout) in zip([0, 2, 3, 5, 7, 9, 11], chans):
            p = f"texture_predictor.res_color_net.{t}"
            sd[f"{p}.conv1.weight"] = _t(rng, cout, cin, 3, 3)
            sd[f"{p}.conv1.bias"] = _t(rng, cout)
            add_bn(f"{p}.bn1", cout)
            sd[f"{p}.conv2.weight"] = _t(rng, cout, cout, 3, 3)
            sd[f"{p}.conv2.bias"] = _t(rng, cout)
            add_bn(f"{p}.bn2", cout)
        sd["texture_predictor.res_color_net.12.weight"] = _t(rng, 3, 16, 3, 3)
        sd["texture_predictor.res_color_net.12.bias"] = _t(rng, 3)
    return sd


def torch_meshnet_forward(sd, x, nz_feat, num_lbs, multiframe=False):
    """Functional reference MeshNet.forward + CameraPredictor (eval mode)."""

    def bn(x, p):
        return F.batch_norm(
            x, sd[f"{p}.running_mean"], sd[f"{p}.running_var"],
            sd[f"{p}.weight"], sd[f"{p}.bias"], training=False)

    rsd = {k[len("encoder.resnet_conv.resnet."):]: v for k, v in sd.items()
           if k.startswith("encoder.resnet_conv.resnet.")}
    feat = torch_resnet18_forward(rsd, x)
    res = F.conv2d(feat, sd["encoder.enc_conv1.0.weight"],
                   sd["encoder.enc_conv1.0.bias"], stride=2, padding=1)
    res = F.leaky_relu(bn(res, "encoder.enc_conv1.1"), 0.2)
    h = res.reshape(res.shape[0], -1)
    for i in range(2):
        h = F.linear(h, sd[f"encoder.enc_fc.{i}.0.weight"],
                     sd[f"encoder.enc_fc.{i}.0.bias"])
        h = F.leaky_relu(bn(h, f"encoder.enc_fc.{i}.1"), 0.2)
    delta_v = F.linear(
        h, sd["code_predictor.transform_predictor.final_layer_trans.weight"],
        sd["code_predictor.transform_predictor.final_layer_trans.bias"],
    ).reshape(h.shape[0], num_lbs, 3)

    c = F.conv2d(res, sd["camera_predictor.conv_c.0.weight"],
                 sd["camera_predictor.conv_c.0.bias"])[..., 0, 0]
    c = F.leaky_relu(c, 0.01)
    for i in (1, 2):
        f = F.linear(c, sd[f"camera_predictor.fc{i}.0.weight"],
                     sd[f"camera_predictor.fc{i}.0.bias"])
        if multiframe:
            f = F.layer_norm(f, (200,), sd[f"camera_predictor.fc{i}.1.weight"],
                             sd[f"camera_predictor.fc{i}.1.bias"])
        c = c + F.leaky_relu(f, 0.01)
    scale = F.relu(F.linear(
        c, sd["camera_predictor.scale_predictor.pred_layer.weight"],
        sd["camera_predictor.scale_predictor.pred_layer.bias"]) + 1) + 1e-12
    trans = F.linear(c, sd["camera_predictor.trans_predictor.pred_layer.weight"],
                     sd["camera_predictor.trans_predictor.pred_layer.bias"])
    quat = F.normalize(F.linear(
        c, sd["camera_predictor.quat_predictor.pred_layer.weight"],
        sd["camera_predictor.quat_predictor.pred_layer.bias"]))
    cam = torch.cat([scale, trans, quat], dim=-1)
    return delta_v, cam, res


def torch_texture_forward(sd, res, uv_sampler):
    """Functional reference TexturePredictorUV (mesh_net.py:135-180)."""

    def bn(x, p):
        return F.batch_norm(
            x, sd[f"{p}.running_mean"], sd[f"{p}.running_var"],
            sd[f"{p}.weight"], sd[f"{p}.bias"], training=False)

    def reslayer(x, p):
        out = F.conv2d(x, sd[f"{p}.conv1.weight"], sd[f"{p}.conv1.bias"],
                       padding=1)
        out = F.leaky_relu(bn(out, f"{p}.bn1"), 0.01)
        out = F.conv2d(out, sd[f"{p}.conv2.weight"], sd[f"{p}.conv2.bias"],
                       padding=1)
        out = bn(out, f"{p}.bn2")
        if x.shape[1] == out.shape[1]:
            out = out + x
        return F.leaky_relu(out, 0.01)

    up = lambda x: F.interpolate(x, scale_factor=2, mode="bilinear",
                                 align_corners=False)
    x = F.interpolate(res, scale_factor=(1.0, 2.0), mode="bilinear",
                      align_corners=False)
    pfx = "texture_predictor.res_color_net"
    x = up(reslayer(x, f"{pfx}.0"))
    x = reslayer(x, f"{pfx}.2")
    x = up(reslayer(x, f"{pfx}.3"))
    x = up(reslayer(x, f"{pfx}.5"))
    x = up(reslayer(x, f"{pfx}.7"))
    x = up(reslayer(x, f"{pfx}.9"))
    x = reslayer(x, f"{pfx}.11")
    uvimage = F.conv2d(x, sd[f"{pfx}.12.weight"], sd[f"{pfx}.12.bias"],
                       padding=1)
    Fp, T = uv_sampler.shape[0], uv_sampler.shape[1]
    grid = torch.tensor(np.asarray(uv_sampler, np.float32)).reshape(
        1, Fp, T * T, 2).repeat(uvimage.shape[0], 1, 1, 1)
    tex = F.grid_sample(uvimage, grid, align_corners=True)
    tex = tex.reshape(uvimage.shape[0], 3, Fp, T, T).permute(0, 2, 3, 4, 1)
    return (torch.tanh(tex) + 1) / 2


@pytest.mark.parametrize("multiframe", [False, True])
def test_meshnet_checkpoint_import_forward_parity(multiframe):
    """convert_meshnet: a synthesized reference-format pred_net state dict
    imports into MeshNet and reproduces the reference functional forward
    tensor-for-tensor (codes, camera, texture atlas, template state)."""
    from acfm_video_3d_reconstruction_tpu.models import build_template
    from acfm_video_3d_reconstruction_tpu.models.mesh_net import MeshNet

    rng = np.random.default_rng(7)
    nz_feat, img_size = 48, 256
    template = build_template(subdivide=1, num_lbs=5, tex_size=2, num_kps=4)
    sd_t = make_meshnet_state_dict(rng, template, nz_feat=nz_feat,
                                   multiframe=multiframe, img_size=img_size)
    sd = {k: v.numpy() for k, v in sd_t.items()}

    model = MeshNet(template=template, nz_feat=nz_feat, predict_texture=True,
                    use_camera_layernorm=multiframe)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, img_size, img_size, 3)),
        method=model.init_all)
    params, stats = torch_import.convert_meshnet(sd)
    params = torch_import.jax_tree_merge(
        jax.tree_util.tree_map(np.asarray, variables["params"]), params)
    stats = torch_import.jax_tree_merge(
        jax.tree_util.tree_map(np.asarray, variables["batch_stats"]), stats)

    x = rng.standard_normal((2, img_size, img_size, 3)).astype(np.float32)
    with torch.no_grad():
        ref_dv, ref_cam, ref_res = torch_meshnet_forward(
            sd_t, torch.tensor(np.transpose(x, (0, 3, 1, 2))), nz_feat, 5,
            multiframe=multiframe)
        ref_tex = torch_texture_forward(sd_t, ref_res, template.uv_sampler)

    out = model.apply({"params": params, "batch_stats": stats},
                      jnp.asarray(x), train=False)
    # deep random nets amplify accumulation-order noise; tolerances follow
    # the resnet18 golden above
    np.testing.assert_allclose(np.asarray(out["delta_v"]), ref_dv.numpy(),
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(out["cam_pred"]), ref_cam.numpy(),
                               rtol=2e-2, atol=2e-2)
    res_ours = np.asarray(out["res_feats"])
    # activations here are ~1e5 (0.1-scale random weights over 20 convs);
    # atol=5 is ~5e-5 relative — pure accumulation-order noise headroom
    np.testing.assert_allclose(
        res_ours, np.transpose(ref_res.numpy(), (0, 2, 3, 1)),
        rtol=3e-2, atol=5.0)
    # texture atlas from the SAME res_feats on both sides isolates decoder
    # parity from upstream accumulation noise
    tex_ours = model.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(np.transpose(ref_res.numpy(), (0, 2, 3, 1))),
        train=False, method=model.textures)
    np.testing.assert_allclose(np.asarray(tex_ours), ref_tex.numpy(),
                               rtol=2e-2, atol=2e-2)
    # template state is copied verbatim
    np.testing.assert_array_equal(np.asarray(params["mean_v"]), sd["mean_v"])
    np.testing.assert_array_equal(np.asarray(params["lbs_logits"]), sd["lbs"])
    np.testing.assert_array_equal(np.asarray(params["vert2kp_logits"]),
                                  sd["vert2kp"])


def test_load_reference_meshnet_via_file(tmp_path):
    """File-level loader (the --load_torch_checkpoint CLI path) round-trips
    through torch.save and shape-checks against a real MeshNet tree."""
    from acfm_video_3d_reconstruction_tpu.models import build_template
    from acfm_video_3d_reconstruction_tpu.models.mesh_net import MeshNet

    rng = np.random.default_rng(8)
    template = build_template(subdivide=1, num_lbs=5, tex_size=2, num_kps=4)
    sd = make_meshnet_state_dict(rng, template, nz_feat=48, img_size=256)
    path = tmp_path / "pred_net_10.pth"
    torch.save(sd, str(path))

    model = MeshNet(template=template, nz_feat=48, predict_texture=True)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 3)),
        method=model.init_all)
    params, stats = torch_import.load_reference_meshnet(
        variables["params"], variables["batch_stats"], str(path))
    np.testing.assert_array_equal(np.asarray(params["mean_v"]),
                                  sd["mean_v"].numpy())
    np.testing.assert_allclose(
        np.asarray(params["camera_predictor"]["conv_c"]["kernel"]),
        np.transpose(sd["camera_predictor.conv_c.0.weight"].numpy(),
                     (2, 3, 1, 0)), atol=1e-7)
