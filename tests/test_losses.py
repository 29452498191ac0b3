"""Loss-layer tests against torch-CPU oracles (torch.nn.functional CE /
manual masked reductions implementing the reference formulas)."""
import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from spacap3d_tpu.train import losses as L

B, K, M = 2, 6, 5   # batch, proposals, max objects
NS = 4              # size clusters
SEEDS, NPTS = 8, 32


def make_endpoints(rng):
    ep = {
        "seed_xyz": rng.randn(B, SEEDS, 3).astype(np.float32),
        "seed_inds": rng.randint(0, NPTS, (B, SEEDS)).astype(np.int64),
        "vote_xyz": rng.randn(B, SEEDS, 3).astype(np.float32),
        "vote_label": rng.randn(B, NPTS, 9).astype(np.float32),
        "vote_label_mask": rng.randint(0, 2, (B, NPTS)).astype(np.int64),
        "aggregated_vote_xyz": rng.randn(B, K, 3).astype(np.float32),
        "center_label": rng.randn(B, M, 3).astype(np.float32),
        "objectness_scores": rng.randn(B, K, 2).astype(np.float32),
        "center": rng.randn(B, K, 3).astype(np.float32),
        "box_label_mask": (rng.rand(B, M) > 0.3).astype(np.float32),
        "heading_class_label": np.zeros((B, M), np.int64),
        "heading_residual_label": np.zeros((B, M), np.float32),
        "heading_scores": rng.randn(B, K, 1).astype(np.float32),
        "heading_residuals_normalized": rng.randn(B, K, 1).astype(np.float32),
        "size_class_label": rng.randint(0, NS, (B, M)).astype(np.int64),
        "size_residual_label": rng.randn(B, M, 3).astype(np.float32),
        "size_scores": rng.randn(B, K, NS).astype(np.float32),
        "size_residuals_normalized": rng.randn(B, K, NS, 3).astype(np.float32),
        "sem_cls_label": rng.randint(0, NS, (B, M)).astype(np.int64),
        "sem_cls_scores": rng.randn(B, K, NS).astype(np.float32),
        "bbox_mask": rng.randint(0, 2, (B, K)).astype(np.int64),
        "lang_cap": np.log(
            np.random.RandomState(3).dirichlet(np.ones(7), (B, 4)).astype(np.float32)
        ),
        "lang_ids": np.concatenate(
            [np.full((B, 1), 2), rng.randint(0, 7, (B, 6))], 1
        ).astype(np.int64),
        "good_bbox_masks": np.ones((B,), bool),
        "box_label_mask_int": None,  # set below
        "x_label": rng.randint(0, 3, (B, M, M)).astype(np.int64),
        "y_label": rng.randint(0, 3, (B, M, M)).astype(np.int64),
        "z_label": rng.randint(0, 3, (B, M, M)).astype(np.int64),
        "relation_pred": rng.randn(B, K, K, 9).astype(np.float32),
    }
    ep["box_label_mask_int"] = ep["box_label_mask"].astype(np.int64)
    return ep


def test_full_loss_against_torch_oracle(rng):
    ep_np = make_endpoints(rng)
    ep = {k: jnp.asarray(v) for k, v in ep_np.items()}
    mean_sizes = np.abs(rng.randn(NS, 3)).astype(np.float32) + 0.5

    out = L.get_scene_cap_loss(
        ep, jnp.asarray(mean_sizes), num_heading_bin=1, num_size_cluster=NS,
        detection=True, caption=True, use_relation=True,
    )

    # ---- torch oracle -------------------------------------------------
    t = {k: torch.from_numpy(np.asarray(v)) for k, v in ep_np.items()}

    # objectness
    d = torch.cdist(t["aggregated_vote_xyz"], t["center_label"]) ** 2
    dist1, ind1 = d.min(-1)
    edist = torch.sqrt(dist1 + 1e-6)
    obj_label = (edist < 0.3).long()
    obj_mask = ((edist < 0.3) | (edist > 0.6)).float()
    per = F.cross_entropy(
        t["objectness_scores"].permute(0, 2, 1), obj_label,
        weight=torch.tensor([0.2, 0.8]), reduction="none",
    )
    want_obj = (per * obj_mask).sum() / (obj_mask.sum() + 1e-6)
    np.testing.assert_allclose(float(out["objectness_loss"]), float(want_obj), rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(out["objectness_label"]), obj_label.numpy())
    np.testing.assert_array_equal(np.asarray(out["object_assignment"]), ind1.numpy())

    # sem cls
    assign = ind1
    sem_label = torch.gather(t["sem_cls_label"], 1, assign)
    sem_ce = F.cross_entropy(
        t["sem_cls_scores"].permute(0, 2, 1), sem_label, reduction="none"
    )
    objf = obj_label.float()
    want_sem = (sem_ce * objf).sum() / (objf.sum() + 1e-6)
    np.testing.assert_allclose(float(out["sem_cls_loss"]), float(want_sem), rtol=1e-4)

    # center loss
    d2 = torch.cdist(t["center"], t["center_label"]) ** 2
    c1 = (d2.min(-1).values * objf).sum() / (objf.sum() + 1e-6)
    blm = t["box_label_mask"]
    c2 = (d2.min(1).values * blm).sum() / (blm.sum() + 1e-6)
    np.testing.assert_allclose(float(out["center_loss"]), float(c1 + c2), rtol=1e-4)

    # size reg loss
    size_label = torch.gather(t["size_class_label"], 1, assign)
    srl = torch.gather(t["size_residual_label"], 1, assign[..., None].expand(-1, -1, 3))
    onehot = F.one_hot(size_label, NS).float()
    pred = (t["size_residuals_normalized"] * onehot[..., None]).sum(2)
    mean_lbl = (onehot[..., None] * torch.from_numpy(mean_sizes)[None, None]).sum(2)
    err = pred - srl / mean_lbl
    ae = err.abs()
    hub = 0.5 * torch.clamp(ae, max=1.0) ** 2 + (ae - torch.clamp(ae, max=1.0))
    want_sizereg = (hub.mean(-1) * objf).sum() / (objf.sum() + 1e-6)
    np.testing.assert_allclose(float(out["size_reg_loss"]), float(want_sizereg), rtol=1e-4)

    # caption loss: CE(ignore_index=0) over lang_ids[:,1:T+1], denominator
    # counts all words of all good boxes
    T_ = ep_np["lang_cap"].shape[1]
    target = t["lang_ids"][:, 1:T_ + 1]
    ce = F.cross_entropy(
        torch.from_numpy(ep_np["lang_cap"]).reshape(-1, 7), target.reshape(-1),
        ignore_index=0, reduction="none",
    )
    want_cap = ce.sum() / (B * T_ + 1e-6)
    np.testing.assert_allclose(float(out["cap_loss"]), float(want_cap), rtol=1e-4)

    # relation loss: mean CE over pairs with valid[i] & valid[j]
    valid = (torch.gather(t["box_label_mask_int"], 1, assign) & obj_label).float()
    pm = valid[:, :, None] * valid[:, None, :]
    for i, ax in enumerate("xyz"):
        lbl = torch.gather(t[f"{ax}_label"], 1, assign[..., None].expand(-1, -1, M))
        lbl = torch.gather(lbl, 2, assign[:, None, :].expand(-1, K, -1))
        logits = torch.from_numpy(ep_np["relation_pred"][..., 3 * i:3 * i + 3])
        ce = F.cross_entropy(logits.reshape(-1, 3), lbl.reshape(-1), reduction="none")
        want = (ce * pm.reshape(-1)).sum() / pm.sum()
        got = float(out[f"{ax}_loss"])
        np.testing.assert_allclose(got, float(want), rtol=1e-4)

    # composition
    want_det = (out["vote_loss"] + 0.5 * out["objectness_loss"]
                + out["box_loss"] + 0.1 * out["sem_cls_loss"])
    np.testing.assert_allclose(float(out["det_loss"]), float(want_det), rtol=1e-6)
    want_total = 10 * out["det_loss"] + out["cap_loss"] + 0.1 * out["relation_loss"]
    np.testing.assert_allclose(float(out["loss"]), float(want_total), rtol=1e-6)


def test_vote_loss_oracle(rng):
    ep_np = make_endpoints(rng)
    ep = {k: jnp.asarray(v) for k, v in ep_np.items() if v is not None}
    got = float(L.compute_vote_loss(ep))

    # numpy oracle (reference :20-67)
    total, count = 0.0, 0.0
    for b in range(B):
        for s in range(SEEDS):
            ind = ep_np["seed_inds"][b, s]
            mask = ep_np["vote_label_mask"][b, ind]
            gt = ep_np["vote_label"][b, ind].reshape(3, 3) + ep_np["seed_xyz"][b, s]
            v = ep_np["vote_xyz"][b, s]
            dmin = min(np.abs(v - g).sum() for g in gt)
            total += dmin * mask
            count += mask
    np.testing.assert_allclose(got, total / (count + 1e-6), rtol=1e-4)
