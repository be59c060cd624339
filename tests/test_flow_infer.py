"""Flow-inference pipeline tests: channel order/units settled against the
torch reference semantics, deconv layout vs torch ConvTranspose2d, the
all-pairs clip layout, and the torch-checkpoint conversion roundtrip.

Reference: multiframe/main.py:385-411 (set_input flow pass),
multiframe/data/optical_flow/model/MaskFlownet.py (Upsample :53-64, warp
:209-245, deconv :32-33).
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from acfm_video_3d_reconstruction_tpu.flow import infer  # noqa: E402
from acfm_video_3d_reconstruction_tpu.flow import maskflownet as mfn  # noqa: E402
from acfm_video_3d_reconstruction_tpu.flow import ops as fops  # noqa: E402

torch = pytest.importorskip("torch")


# ---------------------------------------------------------------------------
# torch-format checkpoint synthesis (reference module naming)
# ---------------------------------------------------------------------------

def _is_bare(name: str) -> bool:
    """Reference modules saved bare (.weight): predict_flow/predict_mask
    convs, deconvs (upfeat), deformable convs, and dc_conv7 (a bare
    predict_flow). conv()/dc_conv1-6 are Sequential(conv, LeakyReLU) ->
    '.0.weight'."""
    return name.startswith(("pred_flow", "pred_mask", "upfeat", "deform")) or (
        name == "dc_conv7"
    )


def export_torch_state_dict(params: dict, rng: np.random.Generator) -> dict:
    """Build a reference-named torch state dict carrying `params` weights.

    Inverts convert_torch_state_dict's layout transposes so that a
    roundtrip through the converter reproduces `params` exactly.
    """
    sd = {}
    for stage, prefix in (("s", "MaskFlownet_S."), ("m", "")):
        for name, p in params[stage].items():
            w = np.asarray(p["w"])
            if name.startswith("upfeat"):
                # stored (kh, kw, O, I) <- torch ConvTranspose2d (I, O, kh, kw)
                tw = np.transpose(w, (3, 2, 0, 1))
            else:
                # stored (kh, kw, I, O) <- torch Conv2d (O, I, kh, kw)
                tw = np.transpose(w, (3, 2, 0, 1))
            key = prefix + name + (".weight" if _is_bare(name) else ".0.weight")
            sd[key] = torch.tensor(tw)
            sd[key.replace("weight", "bias")] = torch.tensor(np.asarray(p["b"]))
    return sd


def test_deconv_matches_torch_conv_transpose():
    """_deconv == torch ConvTranspose2d(k=4, s=2, p=1) after conversion."""
    rng = np.random.default_rng(0)
    cin, cout = 5, 3
    x = rng.standard_normal((2, 6, 7, cin)).astype(np.float32)
    tconv = torch.nn.ConvTranspose2d(cin, cout, 4, 2, 1, bias=True)
    with torch.no_grad():
        ref = tconv(torch.tensor(np.transpose(x, (0, 3, 1, 2)))).numpy()
    ref = np.transpose(ref, (0, 2, 3, 1))

    w = tconv.weight.detach().numpy()  # (I, O, 4, 4)
    p = {
        "w": jnp.asarray(np.transpose(w, (2, 3, 1, 0))),  # converter layout
        "b": jnp.asarray(tconv.bias.detach().numpy()),
    }
    out = np.asarray(mfn._deconv(p, jnp.asarray(x)))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_upsample2d_flow_matches_torch_reference():
    """Triangle-kernel Upsample == the reference implementation (torch)."""
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 5, 6, 3)).astype(np.float32)
    factor = 4

    # reference Upsample (MaskFlownet.py:53-64), torch, NCHW
    img = torch.tensor(np.transpose(x, (0, 3, 1, 2)))
    B, C, H, W = img.shape
    batch_img = img.reshape(B * C, 1, H, W)
    batch_img = torch.nn.functional.pad(batch_img, [0, 1, 0, 1], mode="replicate")
    w = factor * 2 - 1
    c = w // 2
    k1 = 1 - torch.abs(c - torch.arange(w, dtype=torch.float32)) / (c + 1)
    kernel = (k1.repeat(w).view(w, -1) * k1.unsqueeze(1)).view(1, 1, w, w)
    up = torch.nn.functional.conv_transpose2d(
        batch_img, kernel, stride=factor, padding=factor - 1
    )[:, :, :-1, :-1]
    ref = np.transpose(
        up.view(B, C, up.shape[2], up.shape[3]).numpy(), (0, 2, 3, 1)
    )

    out = np.asarray(fops.upsample2d_flow(jnp.asarray(x), factor))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_predict_pair_flow_channel_order_and_units(monkeypatch):
    """A constant net flow (dy=2, dx=6) at net resolution must come out as
    (dx, dy) scaled to output pixels: dx = 6*S/768, dy = 2*S/384."""
    S = 64
    dy_net, dx_net = 2.0, 6.0

    def fake_net(params, im0, im1):
        B = im0.shape[0]
        h, w = infer.NET_H // 4, infer.NET_W // 4
        pred = jnp.zeros((B, h, w, 2))
        # pred[-1] is multiplied by nothing here: emit final-unit values
        pred = pred.at[..., 0].set(dy_net).at[..., 1].set(dx_net)
        return [pred], None, None

    monkeypatch.setattr(infer.mfn, "maskflownet", fake_net)
    im = jnp.zeros((1, S, S, 3))
    flow = np.asarray(infer.predict_pair_flow.__wrapped__({}, im, im, S))
    assert flow.shape == (1, S, S, 2)
    np.testing.assert_allclose(flow[..., 0], dx_net * S / infer.NET_W, atol=1e-4)
    np.testing.assert_allclose(flow[..., 1], dy_net * S / infer.NET_H, atol=1e-4)


def test_clip_flows_all_pairs_layout(monkeypatch):
    """Slot t holds flow(t->t+1) for every consecutive pair; last slot 0."""
    S = 32
    calls = {}

    def fake_predict(params, im0, im1, out_size, net_hw=None):
        calls["n_pairs"] = im0.shape[0]
        # encode the pair id (mean intensity difference) into the flow
        val = (im1 - im0).mean(axis=(1, 2, 3))
        return jnp.broadcast_to(
            val[:, None, None, None], (im0.shape[0], out_size, out_size, 2)
        )

    monkeypatch.setattr(infer, "predict_pair_flow", fake_predict)
    B, T = 2, 4
    imgs = jnp.stack(
        [jnp.full((B, S, S, 3), float(t)) for t in range(T)], axis=1
    )
    flows = np.asarray(infer.clip_flows({}, imgs, S))
    assert flows.shape == (B, T, S, S, 2)
    assert calls["n_pairs"] == B * (T - 1)
    for t in range(T - 1):
        np.testing.assert_allclose(flows[:, t], 1.0, atol=1e-5)
    np.testing.assert_allclose(flows[:, T - 1], 0.0)


def test_shift_flows_matches_reference_flip_for_T2():
    rng = np.random.default_rng(2)
    flows = rng.standard_normal((2, 2, 8, 8, 2)).astype(np.float32)
    shifted = np.asarray(infer.shift_flows_for_loss(jnp.asarray(flows)))
    flipped = flows[:, ::-1]
    # reference layout zeroes slot 1 before flipping; ours zeroes the last
    flows_ref = flows.copy()
    flows_ref[:, 1] = 0
    np.testing.assert_allclose(shifted[:, 1], flows[:, 0])
    np.testing.assert_allclose(shifted[:, 0], 0.0)
    np.testing.assert_allclose(shifted, flows_ref[:, ::-1])
    del flipped


@pytest.mark.slow
def test_torch_checkpoint_conversion_roundtrip(tmp_path):
    """torch.save -> load_flow_checkpoint reproduces the params pytree and
    the restored net runs."""
    rng = np.random.default_rng(3)
    params = mfn.init_params(jax.random.PRNGKey(0))
    sd = export_torch_state_dict(params, rng)
    path = tmp_path / "maskflownet.pth"
    torch.save(sd, str(path))

    restored = infer.load_flow_checkpoint(str(path))
    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = jax.tree_util.tree_leaves_with_path(restored)
    keys_a = {jax.tree_util.keystr(k) for k, _ in flat_a}
    keys_b = {jax.tree_util.keystr(k) for k, _ in flat_b}
    assert keys_a == keys_b
    by_key = {jax.tree_util.keystr(k): v for k, v in flat_b}
    for k, va in flat_a:
        np.testing.assert_allclose(
            np.asarray(va), np.asarray(by_key[jax.tree_util.keystr(k)]),
            atol=1e-6,
        )

    im = jnp.asarray(rng.random((1, 64, 64, 3), np.float32))
    preds, _, _ = mfn.maskflownet(restored, im, im)
    assert preds[-1].shape == (1, 16, 16, 2)
    assert np.isfinite(np.asarray(preds[-1])).all()


def test_stage1_only_checkpoint(tmp_path):
    """A MaskFlownet_S-only checkpoint (no stage prefix) still converts."""
    rng = np.random.default_rng(4)
    params = mfn.init_params(jax.random.PRNGKey(1))
    sd = export_torch_state_dict(params, rng)
    sd_s = {
        k[len("MaskFlownet_S."):]: v
        for k, v in sd.items()
        if k.startswith("MaskFlownet_S.")
    }
    path = tmp_path / "maskflownet_s.pth"
    torch.save(sd_s, str(path))
    restored = infer.load_flow_checkpoint(str(path))
    assert set(restored["s"]) == set(params["s"])
