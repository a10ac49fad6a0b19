"""Expression compositor: RGB composites from channel math.

Reference: src-core/image/expression.{h,cpp} evaluates a muparser expression
*per pixel* over the channel values (e.g. instrument cfg "ch2, ch2, ch1" or
"(ch2 - ch1) / (ch2 + ch1)"). The TPU-native inversion: parse the expression
once (Python ast, whitelisted nodes only — no eval()) into a closed jnp
function over whole channel arrays, jit it, and let XLA fuse the arithmetic
into a single pass over HBM. Same expression strings as the reference's
instrument cfgs (resources/instrument_cfgs/*.json).
"""

from __future__ import annotations

import ast
import functools
from typing import Callable, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from satdump_tpu.core.exceptions import SatdumpError

_ALLOWED_FUNCS = {
    "min": lambda *a: functools.reduce(jnp.minimum, a),
    "max": lambda *a: functools.reduce(jnp.maximum, a),
    "abs": jnp.abs,
    "sqrt": lambda x: jnp.sqrt(jnp.maximum(x, 0.0)),
    "exp": jnp.exp,
    "log": lambda x: jnp.log(jnp.maximum(x, 1e-12)),
    "log10": lambda x: jnp.log10(jnp.maximum(x, 1e-12)),
    "pow": jnp.power,
    "clamp": lambda x, lo, hi: jnp.clip(x, lo, hi),
    "sin": jnp.sin,
    "cos": jnp.cos,
    "tan": jnp.tan,
    "atan2": jnp.arctan2,
    "floor": jnp.floor,
    "ceil": jnp.ceil,
    "where": lambda c, a, b: jnp.where(c != 0, a, b),
}

_BINOPS = {
    ast.Add: lambda a, b: a + b,
    ast.Sub: lambda a, b: a - b,
    ast.Mult: lambda a, b: a * b,
    ast.Div: lambda a, b: a / b,
    ast.Mod: lambda a, b: jnp.mod(a, b),
    ast.Pow: lambda a, b: jnp.power(a, b),
}

_CMPOPS = {
    ast.Lt: lambda a, b: a < b,
    ast.LtE: lambda a, b: a <= b,
    ast.Gt: lambda a, b: a > b,
    ast.GtE: lambda a, b: a >= b,
    ast.Eq: lambda a, b: a == b,
    ast.NotEq: lambda a, b: a != b,
}


def _eval_node(node, env: Dict[str, jnp.ndarray]):
    if isinstance(node, ast.Expression):
        return _eval_node(node.body, env)
    if isinstance(node, ast.Constant):
        if not isinstance(node.value, (int, float)):
            raise SatdumpError(f"expression: bad constant {node.value!r}")
        return float(node.value)
    if isinstance(node, ast.Name):
        if node.id not in env:
            raise SatdumpError(f"expression: unknown channel/var '{node.id}'")
        return env[node.id]
    if isinstance(node, ast.BinOp) and type(node.op) in _BINOPS:
        return _BINOPS[type(node.op)](_eval_node(node.left, env),
                                      _eval_node(node.right, env))
    if isinstance(node, ast.UnaryOp) and isinstance(node.op, (ast.USub, ast.UAdd)):
        v = _eval_node(node.operand, env)
        return -v if isinstance(node.op, ast.USub) else v
    if isinstance(node, ast.Compare) and len(node.ops) == 1 \
            and type(node.ops[0]) in _CMPOPS:
        a = _eval_node(node.left, env)
        b = _eval_node(node.comparators[0], env)
        return _CMPOPS[type(node.ops[0])](a, b).astype(jnp.float32)
    if isinstance(node, ast.IfExp):
        c = _eval_node(node.test, env)
        return jnp.where(c != 0 if not hasattr(c, "dtype") or c.dtype != jnp.bool_ else c,
                         _eval_node(node.body, env), _eval_node(node.orelse, env))
    if isinstance(node, ast.Call) and isinstance(node.func, ast.Name) \
            and node.func.id in _ALLOWED_FUNCS:
        args = [_eval_node(a, env) for a in node.args]
        return _ALLOWED_FUNCS[node.func.id](*args)
    raise SatdumpError(f"expression: unsupported syntax {ast.dump(node)[:80]}")


def parse_expression(expr: str) -> List[ast.Expression]:
    """Split a composite expression into per-output-channel ASTs. The
    top-level comma (muparser convention, e.g. "ch2, ch2, ch1") separates
    output channels."""
    expr = expr.strip()
    tree = ast.parse(expr, mode="eval")
    if isinstance(tree.body, ast.Tuple):
        return [ast.Expression(body=e) for e in tree.body.elts]
    return [tree]


def compile_expression(expr: str) -> Callable[[Dict[str, np.ndarray]], np.ndarray]:
    """expr + {channel name -> float array} -> (H, W) or (H, W, C) float32
    in [0,1]. Channel arrays must share a shape (apply ChannelTransform
    upstream). The returned callable is jit-compiled per input shape."""
    outs = parse_expression(expr)

    @jax.jit
    def run(env):
        chans = [jnp.asarray(_eval_node(o, env), jnp.float32)
                 + jnp.zeros_like(next(iter(env.values())))
                 for o in outs]
        img = chans[0] if len(chans) == 1 else jnp.stack(chans, axis=-1)
        return jnp.clip(img, 0.0, 1.0)

    def call(env: Dict[str, np.ndarray]) -> np.ndarray:
        env = {k: jnp.asarray(v, jnp.float32) for k, v in env.items()}
        return np.asarray(run(env))

    return call


def _bilinear(img: np.ndarray, x: np.ndarray, y: np.ndarray) -> np.ndarray:
    h, w = img.shape
    x = np.clip(x, 0.0, w - 1.0)
    y = np.clip(y, 0.0, h - 1.0)
    x0 = np.floor(x).astype(int)
    y0 = np.floor(y).astype(int)
    x1 = np.minimum(x0 + 1, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    fx = x - x0
    fy = y - y0
    return (img[y0, x0] * (1 - fx) * (1 - fy) + img[y0, x1] * fx * (1 - fy)
            + img[y1, x0] * (1 - fx) * fy + img[y1, x1] * fx * fy)


def _used_names(trees) -> set:
    used = set()
    for t in trees:
        for n in ast.walk(t):
            if isinstance(n, ast.Name):
                used.add(n.id)
    return used


def _resolve_cal_calls(trees, product, env) -> None:
    """Replace cal("<channel>", "<unit>", lo, hi) calls with env variables
    bound to the normalized calibrated channel (the compositor counterpart
    of the reference's cchN=(N, unit, min, max) syntax)."""
    from satdump_tpu.products.calibration import calibrate_channel

    class T(ast.NodeTransformer):
        def visit_Call(self, node):
            self.generic_visit(node)
            if not (isinstance(node.func, ast.Name) and node.func.id == "cal"):
                return node
            args = [a.value for a in node.args
                    if isinstance(a, ast.Constant)]
            if len(args) != len(node.args) or len(args) not in (2, 4):
                raise SatdumpError("cal() wants (channel, unit[, lo, hi]) "
                                   "constants")
            name, unit = str(args[0]), str(args[1])
            key = f"_cal_{name}_{unit}_{len(env)}"
            v = np.asarray(calibrate_channel(product, name, unit),
                           np.float64)
            if len(args) == 4:
                lo, hi = float(args[2]), float(args[3])
                v = (v - lo) / max(hi - lo, 1e-12)
            env[key] = np.clip(np.nan_to_num(v), 0.0, 1.0
                               ).astype(np.float32)
            return ast.copy_location(ast.Name(id=key, ctx=ast.Load()), node)

    for i, t in enumerate(trees):
        trees[i] = ast.fix_missing_locations(T().visit(t))


def generate_composite(product, expr: str, bit_depth: int = 8) -> np.ndarray:
    """ImageProduct + expression -> uint8/16 composite. Channels are exposed
    as ch<NAME> normalized to [0,1] by their bit depth (the reference's
    convention for raw-count expressions); calibrated values via
    cal("<name>", "<unit>", lo, hi). Channels of different resolutions are
    resampled onto the finest used grid through their ChannelTransforms
    (ref image::generate_composite channel_transform path)."""
    trees = parse_expression(expr)
    env: Dict[str, np.ndarray] = {}
    _resolve_cal_calls(trees, product, env)
    used = _used_names(trees)

    holders = [h for h in product.images if f"ch{h.channel_name}" in used]
    target = max(holders, key=lambda h: h.image.size, default=None)
    for h in holders:
        scale = float((1 << h.bit_depth) - 1)
        a = np.asarray(h.image, np.float32) / scale
        if target is not None and h.image.shape != target.image.shape:
            th, tw = target.image.shape
            X, Y = np.meshgrid(np.arange(tw, dtype=np.float64),
                               np.arange(th, dtype=np.float64))
            tt = getattr(target, "ch_transform", None)
            ct = getattr(h, "ch_transform", None)
            u, v = (tt.forward(X, Y) if tt is not None else (X, Y))
            x, y = (ct.reverse(u, v) if ct is not None else (u, v))
            # transforms both none (or identity): plain scale ratio
            if ct is None or (ct.type == 0 and (tt is None or tt.type == 0)):
                hh, hw = h.image.shape
                x = X * (hw / tw)
                y = Y * (hh / th)
            a = _bilinear(a, x, y).astype(np.float32)
        env[f"ch{h.channel_name}"] = a

    out = _run_trees(trees, env)
    if bit_depth == 8:
        return (out * 255.0 + 0.5).astype(np.uint8)
    return (out * 65535.0 + 0.5).astype(np.uint16)


def _run_trees(trees, env: Dict[str, np.ndarray]) -> np.ndarray:
    jenv = {k: jnp.asarray(v, jnp.float32) for k, v in env.items()}

    @jax.jit
    def run(jenv):
        chans = [jnp.asarray(_eval_node(t, jenv), jnp.float32)
                 + jnp.zeros_like(next(iter(jenv.values())))
                 for t in trees]
        img = chans[0] if len(chans) == 1 else jnp.stack(chans, axis=-1)
        return jnp.clip(img, 0.0, 1.0)

    return np.asarray(run(jenv))
