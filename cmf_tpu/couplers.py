"""Couplers: networks producing (shift, log_scale) pairs.

Reference: cmf/models/components/couplers.py:6-66. The torch version carries a
``.jvp`` per coupler; not needed here (pure functions + ``jax.jvp``).

API: ``init(key) -> {"params","state"}``;
``apply(variables, inputs, train) -> (shift, log_scale, new_state)``.
"""

import jax


class IndependentCoupler:
    """Separate shift and log-scale nets (couplers.py:6-24)."""

    def __init__(self, shift_net, log_scale_net):
        self.shift_net = shift_net
        self.log_scale_net = log_scale_net

    def init(self, key):
        k1, k2 = jax.random.split(key)
        sv, lv = self.shift_net.init(k1), self.log_scale_net.init(k2)
        return {
            "params": {"shift": sv["params"], "log_scale": lv["params"]},
            "state": {"shift": sv["state"], "log_scale": lv["state"]},
        }

    def apply(self, variables, inputs, train=False):
        p, s = variables["params"], variables["state"]
        shift, ss = self.shift_net.apply({"params": p["shift"], "state": s["shift"]}, inputs, train)
        log_scale, ls = self.log_scale_net.apply(
            {"params": p["log_scale"], "state": s["log_scale"]}, inputs, train
        )
        return shift, log_scale, {"shift": ss, "log_scale": ls}


class ChunkedSharedCoupler:
    """One net; split its output channels in half → (shift, log-scale)
    (couplers.py:27-60)."""

    def __init__(self, shift_log_scale_net):
        self.net = shift_log_scale_net

    def init(self, key):
        return self.net.init(key)

    def apply(self, variables, inputs, train=False):
        out, new_state = self.net.apply(variables, inputs, train)
        c = out.shape[1]
        assert c % 2 == 0
        return out[:, : c // 2], out[:, c // 2 :], new_state


class IndexedSharedCoupler:
    """Net emits (B, 2, D); head 0 is shift, head 1 is log-scale — used by
    MADE (couplers.py:63-66)."""

    def __init__(self, shift_log_scale_net):
        self.net = shift_log_scale_net

    def init(self, key):
        return self.net.init(key)

    def apply(self, variables, inputs, train=False):
        out, new_state = self.net.apply(variables, inputs, train)
        assert out.ndim > 2 and out.shape[1] == 2
        return out[:, 0], out[:, 1], new_state
