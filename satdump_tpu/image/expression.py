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


def generate_composite(product, expr: str, bit_depth: int = 8) -> np.ndarray:
    """ImageProduct + expression -> uint8/16 composite. Channels are exposed
    as ch<NAME> normalized to [0,1] by their bit depth (the reference's
    convention for raw-count expressions)."""
    env = {}
    for h in product.images:
        scale = float((1 << h.bit_depth) - 1)
        env[f"ch{h.channel_name}"] = np.asarray(h.image, np.float32) / scale
    out = compile_expression(expr)(env)
    if bit_depth == 8:
        return (out * 255.0 + 0.5).astype(np.uint8)
    return (out * 65535.0 + 0.5).astype(np.uint16)
