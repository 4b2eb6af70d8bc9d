"""Vote-conditioned Swin window attention (SwVoteHeadV4 backbone).

Re-implements the intended behavior of
/root/reference/det3d/models/bbox_heads/swin_utils/sw2votev4_util.py
(whose shipped code is dead-on-arrival — ``kernal_size`` typos :58-63,
bool-dtype attention mask :264-281, missing ``layers.append`` :333-356):

- PatchEmbed 1x1 conv in_ch -> embed_dim + LayerNorm
- one BasicLayer of ``depth`` SwinTransformerBlocks, window ``ws``,
  alternating shift 0 / ws//2, standard Swin region-id attention masking
- WindowAttention with
    * cosine similarity attention with per-head learnable temperature tau
      (clamped >= 0.01) (:80-82)
    * vote embedding: MLP(3 -> 16 -> C) over (pred_center_xy, vote_cls)
      added to q, k and v (:61-79)
    * relative position bias: MLP(2 -> 16 -> heads) over pairwise cartesian
      coordinate deltas inside the window (:58-60, :83-87)
- final LayerNorm, output NHWC.

Feature maps are NHWC (B, H=azimuth, W=range, C); the position embedding is
the cartesian cell-center grid (B, H, W, 2).
"""

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..utils.dtypes import resolve_compute_dtype

from ..ops import swin_attn_pallas, swin_block_pallas


class VoteMLP(nn.Module):
    features: int
    hidden: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, v):
        v = nn.Dense(self.hidden, dtype=self.dtype)(v)
        v = nn.relu(v)
        return nn.Dense(self.features, dtype=self.dtype)(v)


class RPEMLP(nn.Module):
    """Relative-position bias MLP. setup-style with the compact-default
    child names (Dense_0/Dense_1) so the param tree — and the torch
    converter mapping — is unchanged; the fused attention kernel reads the
    raw kernels via the named children."""

    num_heads: int
    hidden: int = 16
    dtype: Any = jnp.float32

    def setup(self):
        self.d0 = nn.Dense(self.hidden, dtype=self.dtype, name="Dense_0")
        self.d1 = nn.Dense(self.num_heads, dtype=self.dtype, name="Dense_1")

    def __call__(self, rel):
        return self.d1(nn.relu(self.d0(rel)))


def window_partition(x, ws):
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)


def window_reverse(win, ws, b, h, w):
    c = win.shape[-1]
    x = win.reshape(b, h // ws, w // ws, ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, c)


def swin_attn_mask(hp, wp, ws, shift):
    """Standard Swin region-id mask for shifted windows, plus nothing for
    shift == 0. Returns (num_windows, T, T) additive mask (0 / -100)."""
    if shift == 0:
        return None
    img = np.zeros((1, hp, wp, 1), np.int32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[:, hs, wsl, :] = cnt
            cnt += 1
    mw = window_partition(jnp.asarray(img, jnp.float32), ws)[..., 0]  # (nW, T)
    diff = mw[:, None, :] - mw[:, :, None]
    return jnp.where(diff != 0, -100.0, 0.0)


class WindowAttention(nn.Module):
    dim: int
    num_heads: int
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, pos, vote, mask=None, pad_mask=None,
                 deterministic=True, num_windows=None):
        # x (nB, T, C); pos (nB, T, 2); vote (nB, T, 3);
        # mask (nW, T, T) or None; pad_mask (nB, T) True=valid;
        # num_windows: static windows-per-sample count (for the static-RPE
        # cache when mask is None)
        nb, t, c = x.shape
        nh = self.num_heads
        hd = c // nh
        x = x.astype(self.dtype)

        ve = VoteMLP(c, dtype=self.dtype, name="vote_mlp")(
            vote.astype(self.dtype))  # (nB, T, C)
        ve = ve.reshape(nb, t, nh, hd).transpose(0, 2, 1, 3)

        qkv = nn.Dense(3 * c, use_bias=True, dtype=self.dtype,
                       name="qkv")(x)
        qkv = qkv.reshape(nb, t, 3, nh, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0] + ve, qkv[1] + ve, qkv[2] + ve  # (nB, nh, T, hd)

        rpe_mod = RPEMLP(nh, dtype=self.dtype, name="rpe")
        tau = self.param("tau", nn.initializers.ones, (1, nh, 1, 1))

        # ---- static-RPE cache (inference) ---------------------------
        # At inference the RPE bias is a pure function of the (frozen)
        # MLP params and the per-window positions — which, for the E2E
        # head, are the fixed cell-center grid: identical every frame.
        # Recomputing it per frame materializes an (nB, T, T, hidden)
        # f32 pair tensor (~150 MB at flagship scale) to reproduce a
        # frame-invariant (nW, nh, T, T) table. Callers opt in by
        # running ONE forward with mutable=["rpe_cache"]
        # (E2EDetector.prepare_inference) and threading the returned
        # collection through later applies; the fill pass stores exactly
        # what the live path computed (region mask folded in), so a
        # cached frame is the live frame minus the rebuild. Training and
        # non-warmed callers are untouched.
        cache_ok = (deterministic and pad_mask is None
                    and not self.is_initializing())
        filling = cache_ok and self.is_mutable_collection("rpe_cache")
        cached = (cache_ok and not filling
                  and self.has_variable("rpe_cache", "bias"))

        # `not filling` is load-bearing: a prepare_inference fill pass with
        # the Pallas path available must still take the cache-storing
        # branch below, else put_variable is never reached and the "warmed"
        # cache silently doesn't exist (ADVICE r4 low)
        if (deterministic and pad_mask is None and not cached and not filling
                and not self.is_initializing() and swin_attn_pallas.available()):
            # fused inference path: cosine attention + RPE MLP + region
            # mask + softmax + AV in one VMEM-resident Pallas kernel
            # (ops/swin_attn_pallas.py). The dummy call creates/binds the
            # RPE params without materializing the (nB, T, T, 2) deltas.
            rpe_mod(jnp.zeros((1, 2), self.dtype))
            rp = rpe_mod.variables["params"]
            if mask is not None:
                nw = mask.shape[0]
                madd = (mask if nb == nw
                        else jnp.tile(mask, (nb // nw, 1, 1)))
            else:
                madd = None  # unshifted: the kernel skips the mask add
            out = swin_attn_pallas.swin_vote_attention(
                q, k, v, pos, madd,
                rp["Dense_0"]["kernel"], rp["Dense_0"]["bias"],
                rp["Dense_1"]["kernel"], rp["Dense_1"]["bias"],
                jnp.clip(tau, min=0.01).reshape(nh),
            )
            out = out.transpose(0, 2, 1, 3).reshape(nb, t, c)
            out = nn.Dense(c, dtype=self.dtype, name="proj")(out)
            return nn.Dropout(self.proj_drop,
                              deterministic=deterministic)(out)

        # eps INSIDE the sqrt: the plain L2 norm has a NaN gradient at
        # exactly-zero vectors (padded cells at init), and clamping the
        # product downstream does not fix the norm's own VJP.
        # Cosine attention is computed with PRE-normalized rows — q/|q| and
        # k/|k| (and 1/tau folded into q) — so the normalization is two
        # passes over the (nB, nh, T, hd) operands instead of a norm
        # outer-product + divide pass over the (nB, nh, T, T) logits
        # (same math as dividing the logits; logits still accumulate f32
        # on the MXU via preferred_element_type).
        qf, kf = q.astype(jnp.float32), k.astype(jnp.float32)
        qn = jnp.sqrt(jnp.sum(qf * qf, axis=-1, keepdims=True) + 1e-12)
        kn = jnp.sqrt(jnp.sum(kf * kf, axis=-1, keepdims=True) + 1e-12)
        qh = (qf / (qn * jnp.clip(tau, min=0.01))).astype(q.dtype)
        kh = (kf / kn).astype(k.dtype)
        attn = jnp.einsum("bhnd,bhmd->bhnm", qh, kh,
                          preferred_element_type=jnp.float32)

        if cached:
            # frame-invariant (nW, nh, T, T) table, region mask folded in
            tbl = self.get_variable("rpe_cache", "bias")
            nw = tbl.shape[0]
            attn = (attn.reshape(nb // nw, nw, nh, t, t)
                    + tbl[None]).reshape(nb, nh, t, t)
        else:
            # RPE, decomposed: layer-1 is linear, so over a difference
            # rel@W0 + b0 == pos_i@W0 - pos_j@W0 + b0. Computing u = pos@W0
            # per CELL (nB, T, hidden) turns the per-PAIR (nB, T, T, 2)
            # rel materialization + per-pair first matmul into a broadcast
            # subtract that XLA fuses into the tiny second matmul.
            # u and the subtract stay f32: positions reach ~75 m (pc_range)
            # where bf16 ULP is 0.5, so casting u before the subtract would
            # cancel away the sub-meter within-window deltas the bias
            # encodes. Cast to compute dtype only AFTER the subtract, when
            # the values are small again (matches the Pallas kernel, which
            # also computes rel in f32).
            rpe_mod(jnp.zeros((1, 2), self.dtype))  # bind/create params
            rp = rpe_mod.variables["params"]
            u = (pos.astype(jnp.float32)
                 @ rp["Dense_0"]["kernel"].astype(jnp.float32))  # (nB,T,hid)
            h01 = (u[:, :, None, :] - u[:, None, :, :]
                   + rp["Dense_0"]["bias"].astype(jnp.float32))
            h01 = nn.relu(h01.astype(self.dtype))
            rpe = (h01 @ rp["Dense_1"]["kernel"].astype(self.dtype)
                   + rp["Dense_1"]["bias"].astype(self.dtype))  # (nB,T,T,nh)
            rpe_t = rpe.transpose(0, 3, 1, 2).astype(jnp.float32)
            attn = attn + rpe_t

            if filling:
                nw = mask.shape[0] if mask is not None else num_windows
                assert nw is not None, (
                    "static-RPE fill on an unshifted block needs "
                    "num_windows from the caller")
                fold = rpe_t[:nw]
                if mask is not None:
                    fold = fold + mask[:, None]
                self.put_variable("rpe_cache", "bias", fold)

            if mask is not None:
                nw = mask.shape[0]
                attn = (attn.reshape(nb // nw, nw, nh, t, t)
                        + mask[None, :, None])
                attn = attn.reshape(nb, nh, t, t)
        if pad_mask is not None:
            attn = jnp.where(pad_mask[:, None, None, :], attn, -100.0)

        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        attn = nn.Dropout(self.attn_drop, deterministic=deterministic)(attn)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v,
                         preferred_element_type=jnp.float32
                         ).astype(self.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(nb, t, c)
        out = nn.Dense(c, dtype=self.dtype, name="proj")(out)
        return nn.Dropout(self.proj_drop, deterministic=deterministic)(out)


class SwinVoteBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int = 7
    shift_size: int = 0
    mlp_ratio: float = 1.0
    drop: float = 0.0
    attn_drop: float = 0.0
    dtype: Any = jnp.float32
    gelu_approx: bool = True

    @nn.compact
    def __call__(self, x, pos, vote, deterministic=True):
        b, h, w, c = x.shape
        ws, shift = self.window_size, self.shift_size

        shortcut = x
        x = nn.LayerNorm(name="norm1")(x)

        pad_b = (ws - h % ws) % ws
        pad_r = (ws - w % ws) % ws
        hp, wp = h + pad_b, w + pad_r

        def pad(t):
            return jnp.pad(t, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))

        x_p, pos_p, vote_p = pad(x), pad(pos), pad(vote)
        if pad_b or pad_r:
            valid = jnp.pad(
                jnp.ones((b, h, w, 1), bool),
                ((0, 0), (0, pad_b), (0, pad_r), (0, 0)),
            )
        else:
            valid = None  # exact tiling (flagship 256x144 @ ws=8): no
            # pad rows exist, so the pad-mask select over the
            # (nB, nh, T, T) logits is dead weight — skip it

        if shift:
            roll = lambda t: jnp.roll(t, (-shift, -shift), axis=(1, 2))
            x_p, pos_p, vote_p = map(roll, (x_p, pos_p, vote_p))
            if valid is not None:
                valid = jnp.roll(valid, (-shift, -shift), axis=(1, 2))

        xw = window_partition(x_p, ws)
        pw = window_partition(pos_p, ws)
        vw = window_partition(vote_p, ws)
        mw = (window_partition(valid.astype(jnp.float32), ws)[..., 0] > 0
              if valid is not None else None)

        mask = swin_attn_mask(hp, wp, ws, shift)
        out = WindowAttention(
            self.dim, self.num_heads, self.attn_drop, self.drop,
            dtype=self.dtype, name="attn"
        )(xw, pw, vw, mask, mw, deterministic,
          num_windows=(hp // ws) * (wp // ws))

        out = window_reverse(out, ws, b, hp, wp)
        if shift:
            out = jnp.roll(out, (shift, shift), axis=(1, 2))
        out = out[:, :h, :w]

        x = shortcut + out.astype(jnp.float32)
        y = nn.LayerNorm(name="norm2")(x)
        y = nn.Dense(int(c * self.mlp_ratio), dtype=self.dtype,
                     name="mlp_fc1")(y.astype(self.dtype))
        y = nn.gelu(y, approximate=self.gelu_approx)
        y = nn.Dropout(self.drop, deterministic=deterministic)(y)
        y = nn.Dense(c, dtype=self.dtype, name="mlp_fc2")(y)
        y = nn.Dropout(self.drop, deterministic=deterministic)(y)
        return x + y.astype(jnp.float32)


class SwinVoteTransformer(nn.Module):
    """SwVoteHeadV4: patch-embed + depth blocks + final LayerNorm."""

    embed_dim: int = 256
    depth: int = 2
    num_heads: int = 4
    window_size: int = 7
    mlp_ratio: float = 1.0
    drop: float = 0.0
    attn_drop: float = 0.0
    compute_dtype: str = "float32"
    gelu_approx: bool = True  # False = torch-exact erf GELU (parity tests)
    # rematerialize each block in the backward pass (jax.checkpoint):
    # trades recompute FLOPs for the HBM traffic of the stored
    # window-stream intermediates — a training-throughput lever measured
    # by tools/probes/train_anatomy.py (VERDICT r4 next #2)
    remat: bool = False
    # whole-block fused Pallas kernel (ops/swin_block_pallas.py): one
    # program per window-row stripe spans LN1 -> qkv+vote -> cosine attn
    # + RPE -> proj -> residual -> MLP -> residual entirely in VMEM.
    # None = env/backend gate (PARTNER_TPU_PALLAS_BLOCK=1); True/False
    # force for tests. Inference-only; exact tiling required.
    use_block_kernel: Any = None
    block_kernel_interpret: bool = False

    def _block_kernel_params(self, i):
        """The kernel's flat param dict from block{i}'s subtree (child
        params are readable from the parent scope at apply time)."""
        p = self.get_variable("params", f"block{i}")
        if p is None:
            return None
        a = p["attn"]
        return {
            "ln1": p["norm1"], "ln2": p["norm2"],
            "qkv": a["qkv"], "proj": a["proj"],
            "vote_mlp": a["vote_mlp"], "rpe": a["rpe"], "tau": a["tau"],
            "mlp_fc1": p["mlp_fc1"], "mlp_fc2": p["mlp_fc2"],
        }

    @nn.compact
    def __call__(self, x, pos, vote, deterministic=True):
        # x (B, H, W, in_ch); pos (B, H, W, 2); vote (B, H, W, 3)
        dt = resolve_compute_dtype(self.compute_dtype)
        block_cls = (nn.remat(SwinVoteBlock, static_argnums=(4,))
                     if self.remat else SwinVoteBlock)
        x = nn.Conv(self.embed_dim, (1, 1), dtype=dt, name="patch_embed")(x)
        x = nn.LayerNorm(name="patch_norm")(x.astype(jnp.float32))
        ws = self.window_size
        fused_ok = (
            (swin_block_pallas.available() if self.use_block_kernel is None
             else bool(self.use_block_kernel))
            and deterministic and not self.is_initializing()
            and x.shape[1] % ws == 0 and x.shape[2] % ws == 0
        )
        for i in range(self.depth):
            shift = 0 if i % 2 == 0 else ws // 2
            bp = self._block_kernel_params(i) if fused_ok else None
            if bp is not None:
                # pre/post rolls realize the shift; the region mask rides
                # inside the kernel
                h, w = x.shape[1], x.shape[2]
                if shift:
                    roll = lambda t: jnp.roll(t, (-shift, -shift),
                                              axis=(1, 2))
                    xi, pi, vi = roll(x), roll(pos), roll(vote)
                    mask = swin_attn_mask(h, w, ws, shift)
                else:
                    xi, pi, vi, mask = x, pos, vote, None
                y = swin_block_pallas.swin_vote_block(
                    xi.astype(dt), pi, vi, mask, bp, nh=self.num_heads,
                    ws=ws, gelu_approx=self.gelu_approx,
                    interpret=self.block_kernel_interpret,
                ).astype(jnp.float32)
                x = jnp.roll(y, (shift, shift), axis=(1, 2)) if shift else y
                continue
            x = block_cls(
                self.embed_dim, self.num_heads, ws,
                shift_size=shift,
                mlp_ratio=self.mlp_ratio, drop=self.drop,
                attn_drop=self.attn_drop, dtype=dt,
                gelu_approx=self.gelu_approx, name=f"block{i}",
            )(x, pos, vote, deterministic)
        return nn.LayerNorm(name="norm_out")(x)
