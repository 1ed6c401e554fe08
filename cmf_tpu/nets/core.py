"""Coupler networks: MLP, conv ResNet, glow-CNN, autoregressive MLP.

Reference counterpart: cmf/models/components/networks.py. The torch version
carries a hand-written ``.jvp`` per layer (networks.py:24-113,
jvp_layers.py:6-88) because torch couldn't forward-differentiate through
modules; here every net is a pure function so ``jax.jvp`` handles the decoder
pushforward automatically and that entire subsystem disappears.

API: each net has ``init(key) -> {"params","state"}`` and
``apply(variables, x, train) -> (out, new_state)``. Images are NCHW to match
the schema language's channel-first masks; convolutions tell XLA the layout
via dimension_numbers and the TPU layout assigner does the rest.
"""

import contextlib

import numpy as np
import jax
import jax.numpy as jnp

# Compute-precision policy for coupler-net matmuls. Params stay fp32; when the
# policy is bfloat16, matmul operands are cast down and accumulated in fp32
# (preferred_element_type) — the MXU's native fast path. The Gram/Cholesky
# log-det math elsewhere always stays fp32-HIGHEST (SURVEY.md §7 "numerical
# parity"). Read at trace time: set it before jitting a step variant.
_COMPUTE_DTYPE = [jnp.float32]


def set_compute_dtype(dtype):
    _COMPUTE_DTYPE[0] = jnp.bfloat16 if str(dtype) in ("bf16", "bfloat16") else jnp.float32


@contextlib.contextmanager
def compute_dtype(dtype):
    old = _COMPUTE_DTYPE[0]
    set_compute_dtype(dtype)
    try:
        yield
    finally:
        _COMPUTE_DTYPE[0] = old


# (A `fused_inference()` trace-time context once routed couplers through
# Pallas inference kernels here; both round-4 candidates were removed after
# measured A/Bs on the v5e — fused-MLP +1.3% noise, fused ResNet coupler 3×
# slower at the batch sizes the no-grad paths actually use — and the
# context went with them. See ROADMAP "Image-path verdict".)


def _matmul(x, w):
    cd = _COMPUTE_DTYPE[0]
    if cd == jnp.float32:
        return x @ w
    return jnp.dot(x.astype(cd), w.astype(cd), preferred_element_type=jnp.float32)


def get_activation(name):
    if name == "tanh":
        return jnp.tanh
    if name == "relu":
        return jax.nn.relu
    raise ValueError(f"Invalid activation {name}")


def _dense_init(key, n_in, n_out):
    # torch nn.Linear default: U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both W, b
    bound = 1.0 / np.sqrt(n_in)
    wk, bk = jax.random.split(key)
    return {
        "w": jax.random.uniform(wk, (n_in, n_out), minval=-bound, maxval=bound),
        "b": jax.random.uniform(bk, (n_out,), minval=-bound, maxval=bound),
    }


def _conv_init(key, c_in, c_out, ksize, bias=True):
    fan_in = c_in * ksize * ksize
    bound = 1.0 / np.sqrt(fan_in)
    wk, bk = jax.random.split(key)
    p = {
        "w": jax.random.uniform(wk, (c_out, c_in, ksize, ksize), minval=-bound, maxval=bound)
    }
    if bias:
        p["b"] = jax.random.uniform(bk, (c_out,), minval=-bound, maxval=bound)
    return p


def _conv2d(x, w, b=None, padding="SAME"):
    # x: (B, C, H, W); w: (O, I, kh, kw)
    cd = _COMPUTE_DTYPE[0]
    if cd != jnp.float32:
        # Pure-bf16 conv with an explicit f32 cast on the OUTPUT (not
        # preferred_element_type): the transpose rule of a mixed-precision
        # conv rejects the f32 cotangent against bf16 weights, which breaks
        # jax.linear_transpose in the Hutchinson JᵀJ path. TPU convs still
        # accumulate in f32 internally.
        out = jax.lax.conv_general_dilated(
            x.astype(cd), w.astype(cd), window_strides=(1, 1), padding=padding,
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        ).astype(jnp.float32)
    else:
        out = jax.lax.conv_general_dilated(
            x, w, window_strides=(1, 1), padding=padding,
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )
    if b is not None:
        out = out + b[None, :, None, None]
    return out


class ConstantNetwork:
    """Fixed or learned constant output (networks.py:12-21)."""

    def __init__(self, shape, value=0.0, fixed=False):
        self.shape = tuple(shape)
        self.value = value
        self.fixed = fixed

    def init(self, key):
        v = jnp.full(self.shape, self.value, dtype=jnp.float32)
        if self.fixed:
            return {"params": {}, "state": {"value": v}}
        return {"params": {"value": v}, "state": {}}

    def apply(self, variables, x, train=False):
        v = variables["state"]["value"] if self.fixed else variables["params"]["value"]
        out = jnp.broadcast_to(v, (x.shape[0],) + self.shape)
        return out, variables["state"]


class IdentityNetwork:
    def init(self, key):
        return {"params": {}, "state": {}}

    def apply(self, variables, x, train=False):
        return x, variables["state"]


class MLP:
    """Dense stack with an activation between layers (networks.py:206-224)."""

    def __init__(self, n_in, hidden, n_out, activation):
        self.sizes = [n_in] + list(hidden) + [n_out]
        self.activation = activation

    def init(self, key):
        keys = jax.random.split(key, len(self.sizes) - 1)
        layers = [
            _dense_init(k, self.sizes[i], self.sizes[i + 1]) for i, k in enumerate(keys)
        ]
        return {"params": {"layers": layers}, "state": {}}

    def apply(self, variables, x, train=False):
        layers = variables["params"]["layers"]
        for i, p in enumerate(layers):
            x = _matmul(x, p["w"]) + p["b"]
            if i < len(layers) - 1:
                x = self.activation(x)
        return x, variables["state"]


class _BatchNorm2d:
    """Standard NCHW batch norm with running stats and optional detached batch
    statistics (networks.py via nn.BatchNorm2d / custom_batchnorm.py:7-37)."""

    def __init__(self, num_channels, momentum=0.1, eps=1e-5, detach=False):
        self.c = num_channels
        self.momentum = momentum
        self.eps = eps
        self.detach = detach

    def init(self, key):
        return {
            "params": {"scale": jnp.ones(self.c), "bias": jnp.zeros(self.c)},
            "state": {"mean": jnp.zeros(self.c), "var": jnp.ones(self.c)},
        }

    def apply(self, variables, x, train=False):
        p, s = variables["params"], variables["state"]
        if train:
            mean = jnp.mean(x, axis=(0, 2, 3))
            var = jnp.var(x, axis=(0, 2, 3))
            if self.detach:
                mean = jax.lax.stop_gradient(mean)
                var = jax.lax.stop_gradient(var)
            new_state = {
                "mean": (1 - self.momentum) * s["mean"] + self.momentum * jax.lax.stop_gradient(mean),
                "var": (1 - self.momentum) * s["var"] + self.momentum * jax.lax.stop_gradient(var),
            }
        else:
            mean, var = s["mean"], s["var"]
            new_state = s
        inv = jax.lax.rsqrt(var + self.eps)[None, :, None, None]
        out = (x - mean[None, :, None, None]) * inv
        out = out * p["scale"][None, :, None, None] + p["bias"][None, :, None, None]
        return out, new_state


class _ResidualBlock:
    """BN → relu → conv3x3, twice, plus skip (networks.py:35-93)."""

    def __init__(self, num_channels, use_batchnorm=True, detach_bn=False):
        self.c = num_channels
        self.use_batchnorm = use_batchnorm
        if use_batchnorm:
            self.bn1 = _BatchNorm2d(num_channels, detach=detach_bn)
            self.bn2 = _BatchNorm2d(num_channels, detach=detach_bn)

    def init(self, key):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        params = {
            "conv1": _conv_init(k1, self.c, self.c, 3, bias=not self.use_batchnorm),
            "conv2": _conv_init(k2, self.c, self.c, 3, bias=not self.use_batchnorm),
        }
        state = {}
        if self.use_batchnorm:
            b1, b2 = self.bn1.init(k3), self.bn2.init(k4)
            params["bn1"], params["bn2"] = b1["params"], b2["params"]
            state["bn1"], state["bn2"] = b1["state"], b2["state"]
        return {"params": params, "state": state}

    def apply(self, variables, x, train=False):
        p, s = variables["params"], variables["state"]
        new_state = dict(s)
        out = x
        if self.use_batchnorm:
            out, new_state["bn1"] = self.bn1.apply({"params": p["bn1"], "state": s["bn1"]}, out, train)
        out = jax.nn.relu(out)
        out = _conv2d(out, p["conv1"]["w"], p["conv1"].get("b"))
        if self.use_batchnorm:
            out, new_state["bn2"] = self.bn2.apply({"params": p["bn2"], "state": s["bn2"]}, out, train)
        out = jax.nn.relu(out)
        out = _conv2d(out, p["conv2"]["w"], p["conv2"].get("b"))
        return out + x, new_state


class ResNet:
    """Conv3x3 → residual blocks → [BN] → relu → conv1x1, wrapped in a scaled
    tanh output head w·tanh(·)+b (networks.py:116-161, 96-113)."""

    def __init__(self, c_in, hidden_channels, c_out, use_batchnorm=True, detach_bn=False):
        self.c_in = c_in
        self.hidden = list(hidden_channels)
        self.c_hidden = self.hidden[0] if self.hidden else c_out
        self.c_out = c_out
        self.use_batchnorm = use_batchnorm
        self.blocks = [
            _ResidualBlock(c, use_batchnorm, detach_bn) for c in self.hidden
        ]
        if use_batchnorm:
            self.out_bn = _BatchNorm2d(self.c_hidden, detach=detach_bn)

    def init(self, key):
        keys = jax.random.split(key, len(self.blocks) + 3)
        params = {"conv_in": _conv_init(keys[0], self.c_in, self.c_hidden, 3, bias=False)}
        state = {}
        blocks_p, blocks_s = [], []
        for blk, k in zip(self.blocks, keys[1:-2]):
            v = blk.init(k)
            blocks_p.append(v["params"])
            blocks_s.append(v["state"])
        params["blocks"], state["blocks"] = blocks_p, blocks_s
        if self.use_batchnorm:
            v = self.out_bn.init(keys[-2])
            params["out_bn"], state["out_bn"] = v["params"], v["state"]
        params["conv_out"] = _conv_init(keys[-1], self.c_hidden, self.c_out, 1, bias=True)
        # Scaled-tanh head (networks.py:96-113)
        params["head_w"] = jnp.ones((self.c_out, 1, 1))
        params["head_b"] = jnp.zeros((self.c_out, 1, 1))
        return {"params": params, "state": state}

    def apply(self, variables, x, train=False):
        # (Routing these couplers through the fused coupler-stack kernel was
        # trialled: it wins 1.5-1.7× only at standalone-forward batch≈50;
        # the actual no-grad consumers — FID/sampling at batch 250-500 —
        # measured 3× SLOWER on v5e (benchmarks/coupler_kernel_bench.py).
        # The kernel remains as committed decision evidence for the image
        # megakernel verdict, see ROADMAP.)
        p, s = variables["params"], variables["state"]
        new_state = dict(s)
        out = _conv2d(x, p["conv_in"]["w"])
        new_blocks = []
        for blk, bp, bs in zip(self.blocks, p["blocks"], s["blocks"]):
            out, ns = blk.apply({"params": bp, "state": bs}, out, train)
            new_blocks.append(ns)
        new_state["blocks"] = new_blocks
        if self.use_batchnorm:
            out, new_state["out_bn"] = self.out_bn.apply(
                {"params": p["out_bn"], "state": s["out_bn"]}, out, train
            )
        out = jax.nn.relu(out)
        out = _conv2d(out, p["conv_out"]["w"], p["conv_out"]["b"])
        out = p["head_w"][None] * jnp.tanh(out) + p["head_b"][None]
        return out, new_state


class GlowCNN:
    """conv3x3 → BN → relu → conv1x1 → BN → relu → conv3x3 (zero-init output)
    (networks.py:164-203)."""

    def __init__(self, c_in, c_hidden, c_out, zero_init_output=True):
        self.c_in, self.c_hidden, self.c_out = c_in, c_hidden, c_out
        self.zero_init_output = zero_init_output
        self.bn1 = _BatchNorm2d(c_hidden)
        self.bn2 = _BatchNorm2d(c_hidden)

    def init(self, key):
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)
        conv3 = _conv_init(k3, self.c_hidden, self.c_out, 3, bias=True)
        if self.zero_init_output:
            conv3 = {"w": jnp.zeros_like(conv3["w"]), "b": jnp.zeros_like(conv3["b"])}
        b1, b2 = self.bn1.init(k4), self.bn2.init(k5)
        return {
            "params": {
                "conv1": _conv_init(k1, self.c_in, self.c_hidden, 3, bias=False),
                "conv2": _conv_init(k2, self.c_hidden, self.c_hidden, 1, bias=False),
                "conv3": conv3,
                "bn1": b1["params"],
                "bn2": b2["params"],
            },
            "state": {"bn1": b1["state"], "bn2": b2["state"]},
        }

    def apply(self, variables, x, train=False):
        p, s = variables["params"], variables["state"]
        out = _conv2d(x, p["conv1"]["w"])
        out, ns1 = self.bn1.apply({"params": p["bn1"], "state": s["bn1"]}, out, train)
        out = jax.nn.relu(out)
        out = _conv2d(out, p["conv2"]["w"])
        out, ns2 = self.bn2.apply({"params": p["bn2"], "state": s["bn2"]}, out, train)
        out = jax.nn.relu(out)
        out = _conv2d(out, p["conv3"]["w"], p["conv3"]["b"])
        return out, {"bn1": ns1, "bn2": ns2}


class AutoregressiveMLP:
    """MADE-style masked MLP with ``num_output_heads`` stacked output heads
    (networks.py:227-288). Output shape (B, heads, D)."""

    def __init__(self, n_in, hidden, num_output_heads, activation):
        assert n_in >= 2
        assert all(n_in <= h for h in hidden), "Random degree init not implemented"
        self.n_in = n_in
        self.hidden = list(hidden)
        self.heads = num_output_heads
        self.activation = activation
        # Degrees exactly as networks.py:258-274.
        degrees = [np.arange(1, n_in + 1)]
        for h in self.hidden:
            degrees.append(np.arange(h) % (n_in - 1) + 1)
        degrees.append(np.tile(np.arange(n_in), num_output_heads))
        self.masks = [
            (degrees[i + 1][:, None] >= degrees[i][None, :]).astype(np.float32).T
            for i in range(len(degrees) - 1)
        ]  # (n_in_i, n_out_i) masks, input-major to match x @ w

    def init(self, key):
        keys = jax.random.split(key, len(self.masks))
        layers = [
            _dense_init(k, m.shape[0], m.shape[1]) for k, m in zip(keys, self.masks)
        ]
        return {
            "params": {"layers": layers},
            "state": {"masks": [jnp.asarray(m) for m in self.masks]},
        }

    def apply(self, variables, x, train=False):
        layers = variables["params"]["layers"]
        masks = variables["state"]["masks"]
        out = x
        for i, (p, m) in enumerate(zip(layers, masks)):
            out = _matmul(out, p["w"] * m) + p["b"]
            if i < len(layers) - 1:
                out = self.activation(out)
        return out.reshape(x.shape[0], self.heads, self.n_in), variables["state"]
