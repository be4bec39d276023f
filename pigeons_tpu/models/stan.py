"""Real ``.stan`` ingestion: a Stan-subset front end compiled to JAX.

The reference's flagship external frontend compiles ``.stan`` files through
BridgeStan and ``ccall``s the generated C++ (``ext/PigeonsBridgeStanExt/
interface.jl:120-183``; custom serializer ``:34-49``; ``param_constrain``
incl. transformed params/generated quantities ``state.jl:4-8``). The
TPU-native equivalent cannot call per-point C++ from inside a vmapped kernel
without destroying batching, so this module COMPILES the Stan model language
itself into traced JAX functions: one ``log_density(x_unconstrained)``
(``propto=false`` + change-of-variables jacobian, exactly BridgeStan's
convention, so normalization constants are correct) that the runtime vmaps
over all replicas and differentiates with ``jax.grad`` for AutoMALA — the
reference's default explorer for Stan targets (``interface.jl:51``).

Supported subset (covers every model in the reference's ``examples/stan/``:
mvn, unid, funnel, banana, bernoulli, eight_schools_{non,}centered, mRNA):

* blocks: ``functions``, ``data``, ``transformed data``, ``parameters``,
  ``transformed parameters``, ``model``, ``generated quantities``;
* types: ``int``, ``real``, ``vector[n]``, ``array[n] int/real`` with
  ``<lower=..., upper=...>`` constraints (Stan's exp / scaled-logit
  transforms with jacobian);
* statements: declarations (with initializers and comma lists), assignment
  (``=``, ``+=``, ``-=``, ``*=``, ``/=``), ``target +=``, vectorized ``~``
  sampling statements, ``for (i in a:b)`` (unrolled at trace time — bounds
  are data, XLA fuses the body), ``if``/``else`` with early ``return``
  (compiled to ``where`` blending so traced conditions work), ternaries,
  user-defined functions;
* densities (all with their normalizing constants, as ``propto=false``):
  normal, cauchy, beta, bernoulli, binomial, uniform, exponential,
  lognormal, student_t + their ``_lpdf``/``_lpmf`` call forms;
* math: ``exp log expm1 log1p sqrt square inv inv_logit logit pow abs fabs
  fmin fmax sum mean dot_self softplus log1p_exp machine_precision lgamma``;
* generated quantities ``*_rng`` functions (host-side extraction only).

Deviations from BridgeStan (documented):
* ``default_reference`` is the standard normal on the UNCONSTRAINED space
  (iid-sampleable, normalized — so stepping-stone logZ equals the marginal
  likelihood). The reference uses the target itself (``interface.jl:86``),
  which makes the annealing path degenerate unless the user supplies a
  reference; passing ``reference=...`` or ``variational=...`` works here too.
* loops unroll at trace time, so loop bounds must be data (true of all
  reference example models).
"""

from __future__ import annotations

import json
import math
import re
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .target import Reference, Target

# ---------------------------------------------------------------------------
# tokenizer
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""
    (?P<comment>//[^\n]*|\#[^\n]*|/\*.*?\*/)
  | (?P<num>((\d+\.\d*|\.\d+|\d+)([eE][+-]?\d+)?))
  | (?P<name>[A-Za-z_][A-Za-z0-9_]*)
  | (?P<op><=|>=|==|!=|\+=|-=|\*=|/=|&&|\|\||[-+*/^<>=!?:;,(){}\[\]|~%.'])
  | (?P<ws>\s+)
    """,
    re.VERBOSE | re.DOTALL,
)


def _tokenize(src: str):
    tokens = []
    pos = 0
    while pos < len(src):
        m = _TOKEN_RE.match(src, pos)
        if m is None:
            raise SyntaxError(f"stan: cannot tokenize at: {src[pos:pos+40]!r}")
        pos = m.end()
        if m.lastgroup in ("comment", "ws"):
            continue
        tokens.append((m.lastgroup, m.group()))
    tokens.append(("eof", ""))
    return tokens


# ---------------------------------------------------------------------------
# parser -> tuple AST
# ---------------------------------------------------------------------------

_BLOCKS = (
    "functions",
    "data",
    "transformed data",
    "parameters",
    "transformed parameters",
    "model",
    "generated quantities",
)

_TYPES = ("int", "real", "vector", "row_vector", "matrix", "array", "void")


class _Parser:
    def __init__(self, tokens):
        self.toks = tokens
        self.i = 0

    def peek(self, k=0):
        return self.toks[self.i + k]

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, val):
        t = self.next()
        if t[1] != val:
            raise SyntaxError(f"stan: expected {val!r}, got {t[1]!r}")
        return t

    def accept(self, val):
        if self.peek()[1] == val:
            self.next()
            return True
        return False

    # -- program ---------------------------------------------------------

    def parse_program(self):
        blocks = {}
        while self.peek()[0] != "eof":
            name = self.next()[1]
            if name == "transformed" or name == "generated":
                name = name + " " + self.next()[1]
            if name not in _BLOCKS:
                raise SyntaxError(f"stan: unknown block {name!r}")
            self.expect("{")
            if name == "functions":
                blocks[name] = self.parse_functions()
            elif name in ("data", "parameters"):
                blocks[name] = self.parse_decls_only()
            else:
                blocks[name] = self.parse_stmts()
            self.expect("}")
        return blocks

    def parse_functions(self):
        funcs = []
        while self.peek()[1] != "}":
            ret_type = self.next()[1]
            name = self.next()[1]
            self.expect("(")
            params = []
            while self.peek()[1] != ")":
                ptype = self.next()[1]
                if ptype == "array":  # array[] real x
                    self.expect("[")
                    while self.peek()[1] != "]":
                        self.next()
                    self.expect("]")
                    ptype = "array " + self.next()[1]
                pname = self.next()[1]
                params.append((ptype, pname))
                if self.peek()[1] == ",":
                    self.next()
            self.expect(")")
            self.expect("{")
            body = self.parse_stmts()
            self.expect("}")
            funcs.append((name, ret_type, params, body))
        return funcs

    def parse_decls_only(self):
        decls = []
        while self.peek()[1] != "}":
            decls.extend(self.parse_decl())
        return decls

    # -- declarations ----------------------------------------------------

    def _parse_constraint(self):
        lower = upper = None
        if self.accept("<"):
            while True:
                kind = self.next()[1]
                self.expect("=")
                # additive precedence: ">" must close the constraint, not
                # parse as a comparison
                e = self.parse_add()
                if kind == "lower":
                    lower = e
                elif kind == "upper":
                    upper = e
                else:
                    raise SyntaxError(f"stan: unsupported constraint {kind!r}")
                if not self.accept(","):
                    break
            self.expect(">")
        return lower, upper

    def parse_decl(self):
        """One declaration statement, possibly with multiple names and
        initializers; returns a list of ('decl', name, base, dims, lower,
        upper, init) nodes."""
        base = self.next()[1]
        dims = []
        lower = upper = None
        if base == "array":
            self.expect("[")
            dims.append(self.parse_expr())
            while self.accept(","):
                dims.append(self.parse_expr())
            self.expect("]")
            base = self.next()[1]  # element type: int / real
            lower, upper = self._parse_constraint()
            base = "array " + base
        elif base in ("int", "real"):
            lower, upper = self._parse_constraint()
        elif base in ("vector", "row_vector"):
            lower, upper = self._parse_constraint()
            self.expect("[")
            dims.append(self.parse_expr())
            self.expect("]")
        else:
            raise SyntaxError(f"stan: unsupported type {base!r}")
        out = []
        while True:
            name = self.next()[1]
            init = None
            if self.accept("="):
                init = self.parse_expr()
            out.append(("decl", name, base, tuple(dims), lower, upper, init))
            if not self.accept(","):
                break
        self.expect(";")
        return out

    # -- statements ------------------------------------------------------

    def parse_stmts(self):
        stmts = []
        while self.peek()[1] not in ("}",) and self.peek()[0] != "eof":
            stmts.extend(self.parse_stmt())
        return stmts

    def parse_stmt(self):
        t = self.peek()
        v = t[1]
        if v == "{":
            self.next()
            body = self.parse_stmts()
            self.expect("}")
            return [("block", body)]
        if v == "for":
            self.next()
            self.expect("(")
            var = self.next()[1]
            self.expect("in")
            lo = self.parse_expr()
            self.expect(":")
            hi = self.parse_expr()
            self.expect(")")
            body = self.parse_stmt()
            return [("for", var, lo, hi, body)]
        if v == "if":
            self.next()
            self.expect("(")
            cond = self.parse_expr()
            self.expect(")")
            then = self.parse_stmt()
            other = []
            if self.accept("else"):
                other = self.parse_stmt()
            return [("if", cond, then, other)]
        if v == "return":
            self.next()
            e = None
            if self.peek()[1] != ";":
                e = self.parse_expr()
            self.expect(";")
            return [("return", e)]
        if v in ("print", "reject"):
            self.next()
            depth = 0
            while not (depth == 0 and self.peek()[1] == ";"):
                tv = self.next()[1]
                depth += tv == "("
                depth -= tv == ")"
            self.expect(";")
            return [("nop",)]
        if v == "target":
            self.next()
            self.expect("+=")
            e = self.parse_expr()
            self.expect(";")
            return [("target", e)]
        # declaration?
        if v in ("int", "real", "vector", "row_vector", "array") and self.peek(1)[1] not in ("(", "["):
            return self.parse_decl()
        if v in ("vector", "row_vector", "array") and self.peek(1)[1] == "[":
            return self.parse_decl()
        # expression statement: lvalue op expr | expr ~ dist(...)
        e = self.parse_expr()
        nxt = self.next()[1]
        if nxt == "~":
            dist = self.next()[1]
            self.expect("(")
            args = self.parse_args(")")
            # optional truncation T[a, b] — unsupported, detect and error
            if self.peek()[1] == "T":
                raise SyntaxError("stan: truncation T[,] not supported")
            self.expect(";")
            return [("sample", e, dist, args)]
        if nxt in ("=", "+=", "-=", "*=", "/="):
            rhs = self.parse_expr()
            self.expect(";")
            return [("assign", e, nxt, rhs)]
        if nxt == ";":
            return [("nop",)]
        raise SyntaxError(f"stan: unexpected {nxt!r} after expression")

    def parse_args(self, closer):
        args = []
        if self.peek()[1] != closer:
            args.append(self.parse_expr())
            while self.peek()[1] in (",", "|"):
                self.next()
                args.append(self.parse_expr())
        self.expect(closer)
        return args

    # -- expressions -----------------------------------------------------

    def parse_expr(self):
        return self.parse_ternary()

    def parse_ternary(self):
        c = self.parse_or()
        if self.accept("?"):
            a = self.parse_expr()
            self.expect(":")
            b = self.parse_expr()
            return ("ternary", c, a, b)
        return c

    def parse_or(self):
        e = self.parse_and()
        while self.accept("||"):
            e = ("or", e, self.parse_and())
        return e

    def parse_and(self):
        e = self.parse_cmp()
        while self.accept("&&"):
            e = ("and", e, self.parse_cmp())
        return e

    def parse_cmp(self):
        e = self.parse_add()
        while self.peek()[1] in ("<", "<=", ">", ">=", "==", "!="):
            op = self.next()[1]
            e = ("cmp", op, e, self.parse_add())
        return e

    def parse_add(self):
        e = self.parse_mul()
        while self.peek()[1] in ("+", "-"):
            op = self.next()[1]
            e = ("bin", op, e, self.parse_mul())
        return e

    def parse_mul(self):
        e = self.parse_unary()
        while self.peek()[1] in ("*", "/", "%"):
            op = self.next()[1]
            e = ("bin", op, e, self.parse_unary())
        return e

    def parse_unary(self):
        if self.peek()[1] in ("-", "+", "!"):
            op = self.next()[1]
            return ("unary", op, self.parse_unary())
        return self.parse_pow()

    def parse_pow(self):
        e = self.parse_postfix()
        if self.accept("^"):
            return ("bin", "^", e, self.parse_unary())
        return e

    def parse_postfix(self):
        t = self.next()
        if t[1] == "(":
            e = self.parse_expr()
            self.expect(")")
        elif t[0] == "num":
            v = t[1]
            e = ("num", int(v) if re.fullmatch(r"\d+", v) else float(v))
        elif t[0] == "name":
            if self.peek()[1] == "(":
                self.next()
                args = self.parse_args(")")
                e = ("call", t[1], args)
            else:
                e = ("var", t[1])
        else:
            raise SyntaxError(f"stan: unexpected token {t[1]!r}")
        while self.peek()[1] == "[":
            self.next()
            idx = [self.parse_expr()]
            while self.accept(","):
                idx.append(self.parse_expr())
            self.expect("]")
            e = ("index", e, tuple(idx))
        if self.accept("'"):
            e = ("transpose", e)
        return e


# ---------------------------------------------------------------------------
# densities (full constants: propto=false, matching the reference's choice
# "to get correct log normalization constants", interface.jl:64-69)
# ---------------------------------------------------------------------------

_HALF_LOG_2PI = 0.5 * math.log(2.0 * math.pi)


def _lpdf_normal(y, mu, sigma):
    return -0.5 * ((y - mu) / sigma) ** 2 - jnp.log(sigma) - _HALF_LOG_2PI


def _lpdf_cauchy(y, mu, sigma):
    return -jnp.log(math.pi * sigma * (1.0 + ((y - mu) / sigma) ** 2))


def _lpdf_beta(y, a, b):
    lbeta = (
        jax.lax.lgamma(1.0 * a) + jax.lax.lgamma(1.0 * b) - jax.lax.lgamma(1.0 * (a + b))
    )
    return (a - 1.0) * jnp.log(y) + (b - 1.0) * jnp.log1p(-y) - lbeta


def _lpmf_bernoulli(y, theta):
    return y * jnp.log(theta) + (1.0 - y) * jnp.log1p(-theta)


def _lpmf_binomial(n, N, p):
    lchoose = (
        jax.lax.lgamma(1.0 + N) - jax.lax.lgamma(1.0 + n) - jax.lax.lgamma(1.0 + N - n)
    )
    return lchoose + n * jnp.log(p) + (N - n) * jnp.log1p(-p)


def _lpdf_uniform(y, a, b):
    inside = (y >= a) & (y <= b)
    return jnp.where(inside, -jnp.log(b - a), -jnp.inf)


def _lpdf_exponential(y, rate):
    return jnp.log(rate) - rate * y


def _lpdf_lognormal(y, mu, sigma):
    return _lpdf_normal(jnp.log(y), mu, sigma) - jnp.log(y)


def _lpdf_student_t(y, nu, mu, sigma):
    z = (y - mu) / sigma
    return (
        jax.lax.lgamma((nu + 1.0) / 2.0)
        - jax.lax.lgamma(nu / 2.0)
        - 0.5 * jnp.log(nu * math.pi)
        - jnp.log(sigma)
        - (nu + 1.0) / 2.0 * jnp.log1p(z * z / nu)
    )


def _lpdf_gamma(y, alpha, beta):
    return (
        alpha * jnp.log(beta)
        - jax.lax.lgamma(1.0 * alpha)
        + (alpha - 1.0) * jnp.log(y)
        - beta * y
    )


def _lpdf_inv_gamma(y, alpha, beta):
    return (
        alpha * jnp.log(beta)
        - jax.lax.lgamma(1.0 * alpha)
        - (alpha + 1.0) * jnp.log(y)
        - beta / y
    )


def _lpmf_poisson(k, lam):
    return k * jnp.log(lam) - lam - jax.lax.lgamma(k + 1.0)


def _lpdf_double_exponential(y, mu, sigma):
    return -jnp.abs(y - mu) / sigma - jnp.log(2.0 * sigma)


def _lpdf_logistic(y, mu, sigma):
    z = (y - mu) / sigma
    return -z - jnp.log(sigma) - 2.0 * jax.nn.softplus(-z)


_DENSITIES = {
    "normal": _lpdf_normal,
    "cauchy": _lpdf_cauchy,
    "beta": _lpdf_beta,
    "bernoulli": _lpmf_bernoulli,
    "binomial": _lpmf_binomial,
    "uniform": _lpdf_uniform,
    "exponential": _lpdf_exponential,
    "lognormal": _lpdf_lognormal,
    "student_t": _lpdf_student_t,
    "gamma": _lpdf_gamma,
    "inv_gamma": _lpdf_inv_gamma,
    "poisson": _lpmf_poisson,
    "double_exponential": _lpdf_double_exponential,
    "logistic": _lpdf_logistic,
}


def _as_f(v):
    if isinstance(v, (int, bool)):
        return float(v)
    return v


_MATH_FNS = {
    "exp": jnp.exp,
    "log": jnp.log,
    "expm1": jnp.expm1,
    "log1p": jnp.log1p,
    "log1m": lambda x: jnp.log1p(-x),
    "sqrt": jnp.sqrt,
    "square": lambda x: x * x,
    "inv": lambda x: 1.0 / _as_f(x),
    "inv_logit": jax.nn.sigmoid,
    "logit": lambda p: jnp.log(p) - jnp.log1p(-p),
    "pow": jnp.power,
    "abs": jnp.abs,
    "fabs": jnp.abs,
    "fmin": jnp.minimum,
    "fmax": jnp.maximum,
    "sum": jnp.sum,
    "mean": jnp.mean,
    "dot_self": lambda x: jnp.sum(x * x),
    "log1p_exp": jax.nn.softplus,
    "log_sum_exp": lambda *a: jnp.logaddexp(*a) if len(a) == 2 else jax.nn.logsumexp(jnp.stack(a)),
    "machine_precision": lambda: float(np.finfo(np.float64).eps),
    "lgamma": lambda x: jax.lax.lgamma(1.0 * x),
    "tgamma": lambda x: jnp.exp(jax.lax.lgamma(1.0 * x)),
    "num_elements": lambda x: int(np.shape(x)[0]),
    "rows": lambda x: int(np.shape(x)[0]),
    "size": lambda x: int(np.shape(x)[0]),
    "rep_vector": lambda v, n: jnp.full((int(n),), v),
    # Stan overloads min/max: binary scalar form AND container reduction
    "min": lambda *a: jnp.min(a[0]) if len(a) == 1 else jnp.minimum(*a),
    "max": lambda *a: jnp.max(a[0]) if len(a) == 1 else jnp.maximum(*a),
    "floor": jnp.floor,
    "ceil": jnp.ceil,
    "sin": jnp.sin,
    "cos": jnp.cos,
    "tan": jnp.tan,
    "atan": jnp.arctan,
    "exp2": jnp.exp2,
    "log2": jnp.log2,
    "log10": jnp.log10,
}


# ---------------------------------------------------------------------------
# evaluator
# ---------------------------------------------------------------------------


class _Return(Exception):
    """Raised for a top-level (unconditional) return."""

    def __init__(self, value):
        self.value = value


class _Evaluator:
    """Tree-walking evaluator building jnp expressions during tracing.

    ``if``/early-``return`` with traced conditions compile to ``where``
    blends: statements execute both branches on copies of the environment
    and blend every modified variable; conditional returns accumulate as
    (condition, value) pairs resolved when the function exits. Conditions
    that are concrete Python values short-circuit to real branches."""

    def __init__(self, functions, rng=None):
        self.functions = {f[0]: f for f in functions}
        self.rng = rng  # np.random.Generator for *_rng (host extraction only)

    # -- expressions -----------------------------------------------------

    def eval_expr(self, node, env):
        kind = node[0]
        if kind == "num":
            return node[1]
        if kind == "var":
            if node[1] not in env:
                raise NameError(f"stan: undefined variable {node[1]!r}")
            return env[node[1]]
        if kind == "bin":
            op, a, b = node[1], self.eval_expr(node[2], env), self.eval_expr(node[3], env)
            if op == "+":
                return a + b
            if op == "-":
                return a - b
            if op == "*":
                return a * b
            if op == "/":
                if isinstance(a, (int, np.integer)) and isinstance(b, (int, np.integer)):
                    return int(a) // int(b)  # Stan int division
                return a / b
            if op == "^":
                return _as_f(a) ** b
            if op == "%":
                return a % b
        if kind == "unary":
            v = self.eval_expr(node[2], env)
            if node[1] == "-":
                return -v
            if node[1] == "!":
                return jnp.logical_not(v) if hasattr(v, "dtype") else (not v)
            return v
        if kind == "cmp":
            op, a, b = node[1], self.eval_expr(node[2], env), self.eval_expr(node[3], env)
            return {
                "<": lambda: a < b,
                "<=": lambda: a <= b,
                ">": lambda: a > b,
                ">=": lambda: a >= b,
                "==": lambda: a == b,
                "!=": lambda: a != b,
            }[op]()
        if kind == "and":
            a = self.eval_expr(node[1], env)
            b = self.eval_expr(node[2], env)
            return jnp.logical_and(a, b) if _traced(a) or _traced(b) else (a and b)
        if kind == "or":
            a = self.eval_expr(node[1], env)
            b = self.eval_expr(node[2], env)
            return jnp.logical_or(a, b) if _traced(a) or _traced(b) else (a or b)
        if kind == "ternary":
            c = self.eval_expr(node[1], env)
            if isinstance(c, (bool, np.bool_)):
                return self.eval_expr(node[2] if c else node[3], env)
            # traced condition: both branches are traced (Stan's C++ only
            # executes one), so sanitize inputs on untaken lanes — the
            # double-where trick — or inf/NaN in the dead branch would
            # poison gradients (e.g. mRNA's exp_a_minus_exp_b at overflow)
            a = self.eval_expr(node[2], _mask_env(env, c))
            b = self.eval_expr(node[3], _mask_env(env, jnp.logical_not(c)))
            return jnp.where(c, a, b)
        if kind == "index":
            base = self.eval_expr(node[1], env)
            idx = tuple(self.eval_expr(i, env) for i in node[2])
            idx = tuple(i - 1 for i in idx)  # Stan is 1-indexed
            return base[idx if len(idx) > 1 else idx[0]]
        if kind == "transpose":
            v = self.eval_expr(node[1], env)
            return jnp.transpose(v) if hasattr(v, "ndim") and v.ndim > 1 else v
        if kind == "call":
            return self.eval_call(node[1], node[2], env)
        raise SyntaxError(f"stan: cannot evaluate {node!r}")

    def eval_call(self, name, arg_nodes, env):
        args = [self.eval_expr(a, env) for a in arg_nodes]
        if name in self.functions:
            return self.call_function(name, args)
        if name in _MATH_FNS:
            return _MATH_FNS[name](*args)
        if name.endswith("_lpdf") or name.endswith("_lpmf"):
            dist = name[:-5]
            if dist not in _DENSITIES:
                raise SyntaxError(f"stan: unsupported density {dist!r}")
            return jnp.sum(_DENSITIES[dist](args[0], *args[1:]))
        if name.endswith("_rng"):
            dist = name[:-4]
            if self.rng is None:
                raise RuntimeError(
                    f"stan: {name} is only available in generated quantities "
                    "during host-side extraction"
                )
            return self._draw(dist, args)
        raise SyntaxError(f"stan: unknown function {name!r}")

    def _draw(self, dist, args):
        r = self.rng
        a = [np.asarray(x) for x in args]
        if dist == "normal":
            return r.normal(a[0], a[1])
        if dist == "bernoulli":
            return (r.random(np.shape(a[0])) < a[0]).astype(np.float64)
        if dist == "uniform":
            return r.uniform(a[0], a[1])
        if dist == "exponential":
            return r.exponential(1.0 / a[0])
        if dist == "beta":
            return r.beta(a[0], a[1])
        if dist == "binomial":
            return r.binomial(int(a[0]), a[1])
        raise SyntaxError(f"stan: unsupported rng {dist!r}")

    def call_function(self, name, args):
        fname, ret_type, params, body = self.functions[name]
        env = {p[1]: a for p, a in zip(params, args)}
        try:
            rets = self.exec_stmts(body, env)
        except _Return as r:
            return r.value
        if not rets:
            return None
        # blend conditional returns (last unconditional return is the base)
        base = None
        conds = []
        for cond, val in rets:
            if cond is None:
                base = val
            else:
                conds.append((cond, val))
        out = base
        for cond, val in reversed(conds):
            out = val if out is None else jnp.where(cond, val, out)
        return out

    # -- statements ------------------------------------------------------

    def exec_stmts(self, stmts, env, mask=None):
        """Execute statements into ``env``; returns a list of
        (condition-or-None, value) for returns reached under traced
        conditions. ``mask`` is the traced path condition (None = on all
        lanes). After a conditional return, the remaining statements run
        under the narrowed mask with a re-sanitized environment, so code
        that is dead on the returned path cannot overflow into NaN
        gradients (e.g. mRNA's ``if (tmt0 <= 0) return 0;`` followed by
        ``exp(-beta*tmt0)``)."""
        rets = []
        cur_mask = mask
        for s in stmts:
            r = self.exec_stmt(s, env, cur_mask)
            rets.extend(r)
            for rc, _ in r:
                if rc is not None and _traced(rc):
                    alive = jnp.logical_not(rc)
                    if cur_mask is not None:
                        alive = jnp.logical_and(cur_mask, alive)
                    cur_mask = alive
                    san = _mask_env(env, cur_mask)
                    env.clear()
                    env.update(san)
        return rets

    def exec_stmt(self, s, env, mask):
        kind = s[0]
        if kind == "nop":
            return []
        if kind == "block":
            return self.exec_stmts(s[1], env, mask)
        if kind == "decl":
            _, name, base, dims, lower, upper, init = s
            if init is not None:
                env[name] = self.eval_expr(init, env)
            else:
                shape = tuple(int(self.eval_expr(d, env)) for d in dims)
                env[name] = jnp.zeros(shape) if shape else 0.0
            return []
        if kind == "assign":
            lv, op, rhs = s[1], s[2], s[3]
            val = self.eval_expr(rhs, env)
            return self._assign(lv, op, val, env, mask)
        if kind == "target":
            inc = self.eval_expr(s[1], env)
            inc = jnp.sum(inc) if hasattr(inc, "ndim") and getattr(inc, "ndim", 0) else inc
            if mask is not None:
                inc = jnp.where(mask, inc, 0.0)
            env["__target__"] = env.get("__target__", 0.0) + inc
            return []
        if kind == "sample":
            y = self.eval_expr(s[1], env)
            dist = s[2]
            if dist.endswith("_lpdf") or dist.endswith("_lpmf"):
                dist = dist[:-5]
            if dist not in _DENSITIES:
                raise SyntaxError(f"stan: unsupported density {dist!r}")
            args = [self.eval_expr(a, env) for a in s[3]]
            inc = jnp.sum(_DENSITIES[dist](y, *args))
            if mask is not None:
                inc = jnp.where(mask, inc, 0.0)
            env["__target__"] = env.get("__target__", 0.0) + inc
            return []
        if kind == "for":
            lo = self.eval_expr(s[2], env)
            hi = self.eval_expr(s[3], env)
            if not isinstance(lo, (int, np.integer)) or not isinstance(hi, (int, np.integer)):
                raise SyntaxError(
                    "stan: loop bounds must be data (loops unroll at trace time)"
                )
            rets = []
            for i in range(int(lo), int(hi) + 1):
                env[s[1]] = i
                rets.extend(self.exec_stmts(s[4], env, mask))
            env.pop(s[1], None)
            return rets
        if kind == "if":
            cond = self.eval_expr(s[1], env)
            if isinstance(cond, (bool, np.bool_)):
                return self.exec_stmts(s[2] if cond else s[3], env, mask)
            # traced condition: run both branches on SANITIZED copies of the
            # environment (untaken lanes see dummy inputs — the double-where
            # trick, so dead-branch inf/NaN cannot poison values or
            # gradients), then blend every write
            c = cond if mask is None else jnp.logical_and(mask, cond)
            notc = jnp.logical_not(cond) if mask is None else jnp.logical_and(
                mask, jnp.logical_not(cond)
            )
            env_t = _mask_env(env, cond)
            base_t = dict(env_t)
            rets = [
                (jnp.logical_and(c, rc) if rc is not None else c, rv)
                for rc, rv in self.exec_stmts(s[2], env_t, c)
            ]
            env_f = _mask_env(env, jnp.logical_not(cond))
            base_f = dict(env_f)
            rets += [
                (jnp.logical_and(notc, rc) if rc is not None else notc, rv)
                for rc, rv in self.exec_stmts(s[3], env_f, notc)
            ]
            for k in set(env_t) | set(env_f):
                mod_t = env_t.get(k) is not base_t.get(k)
                mod_f = env_f.get(k) is not base_f.get(k)
                if not (mod_t or mod_f):
                    continue  # untouched: keep the original, unsanitized value
                vt = env_t[k] if mod_t else env.get(k)
                vf = env_f[k] if mod_f else env.get(k)
                if vt is None:  # declared only inside the then-branch
                    env[k] = env_t[k]
                elif vf is None:
                    env[k] = env_f[k]
                else:
                    env[k] = jnp.where(cond, vt, vf)
            return rets
        if kind == "return":
            val = None if s[1] is None else self.eval_expr(s[1], env)
            if mask is None:
                raise _Return(val)
            return [(mask, val)]
        raise SyntaxError(f"stan: cannot execute {s!r}")

    def _assign(self, lv, op, val, env, mask):
        if lv[0] == "var":
            name = lv[1]
            cur = env.get(name, 0.0)
            new = val if op == "=" else _apply_aug(op, cur, val)
            if mask is not None and op != "=" or (mask is not None and name in env):
                new = jnp.where(mask, new, cur)
            env[name] = new
            return []
        if lv[0] == "index":
            base_name = lv[1]
            if base_name[0] != "var":
                raise SyntaxError("stan: only simple indexed assignment supported")
            name = base_name[1]
            idx = tuple(self.eval_expr(i, env) - 1 for i in lv[2])
            arr = jnp.asarray(env[name])
            sel = idx if len(idx) > 1 else idx[0]
            cur = arr[sel]
            new = val if op == "=" else _apply_aug(op, cur, val)
            if mask is not None:
                new = jnp.where(mask, new, cur)
            env[name] = arr.at[sel].set(new)
            return []
        raise SyntaxError(f"stan: unsupported lvalue {lv!r}")


def _apply_aug(op, cur, val):
    return {
        "+=": lambda: cur + val,
        "-=": lambda: cur - val,
        "*=": lambda: cur * val,
        "/=": lambda: cur / val,
    }[op]()


def _traced(v):
    return isinstance(v, jax.core.Tracer) or isinstance(v, jax.Array)


def _mask_env(env, cond):
    """Branch-entry input sanitization (the generalized double-``where``
    trick): on lanes where ``cond`` is False, every traced floating value is
    replaced by 1.0 before the branch body is traced. The branch's outputs on
    those lanes are discarded by the caller's blend, and the cotangent chain
    through the ``where`` is zero — so overflow/0-division in the dead branch
    can no longer produce NaN values OR NaN gradients (Stan's C++ gets this
    for free by executing only one branch). Only scalar conditions sanitize
    (the subset's conditions are scalars; anything else passes through)."""
    if getattr(cond, "shape", ()) != ():
        return dict(env)
    out = {}
    for k, v in env.items():
        if (
            k != "__target__"
            and _traced(v)
            and jnp.issubdtype(jnp.result_type(v), jnp.floating)
        ):
            out[k] = jnp.where(cond, v, jnp.ones_like(v))
        else:
            out[k] = v
    return out


# ---------------------------------------------------------------------------
# constraint transforms (Stan reference manual, change of variables)
# ---------------------------------------------------------------------------


def _constrain_scalarwise(u, lower, upper):
    """Unconstrained -> constrained + log-jacobian, elementwise (Stan's
    lb/ub/lub transforms)."""
    if lower is None and upper is None:
        return u, jnp.zeros_like(u)
    if lower is not None and upper is None:
        return lower + jnp.exp(u), u
    if lower is None and upper is not None:
        return upper - jnp.exp(u), u
    width = upper - lower
    s = jax.nn.sigmoid(u)
    x = lower + width * s
    logjac = jnp.log(width) + jax.nn.log_sigmoid(u) + jax.nn.log_sigmoid(-u)
    return x, logjac


# ---------------------------------------------------------------------------
# the target
# ---------------------------------------------------------------------------


class StanTarget(Target):
    """A parsed ``.stan`` model as a pigeons_tpu target (reference:
    ``StanLogPotential`` + BridgeStan ext)."""

    def __init__(self, source: str, data: Optional[dict] = None, name: str = "stan_model"):
        self.source = source
        self.name = name
        blocks = _Parser(_tokenize(source)).parse_program()
        self._blocks = blocks
        self._ev = _Evaluator(blocks.get("functions", []))

        # data block: bind + validate
        data = dict(data or {})
        env = {}
        for d in blocks.get("data", []):
            _, dname, base, dims, lower, upper, init = d
            if dname not in data:
                raise ValueError(f"stan: missing data value for {dname!r}")
            v = data[dname]
            if base == "int":
                v = int(v)
            elif base == "real":
                v = float(v)
            else:
                v = np.asarray(v, dtype=np.float64)
                if base.startswith("array int"):
                    v = np.asarray(data[dname], dtype=np.int64)
            env[dname] = v
        # transformed data: runs once, host-side
        td_env = dict(env)
        self._ev.exec_stmts(blocks.get("transformed data", []), td_env)
        td_env.pop("__target__", None)
        self._data_env = td_env

        # parameters: sizes + constraints (evaluated against data)
        self._params = []
        off = 0
        for p in blocks.get("parameters", []):
            _, pname, base, dims, lower, upper, init = p
            if base == "int" or base.startswith("array int"):
                raise ValueError(
                    "stan: integer parameters are not supported (Stan itself "
                    "forbids them)"
                )
            size = 1
            shape = ()
            if dims:
                shape = tuple(int(self._ev.eval_expr(d, td_env)) for d in dims)
                size = int(np.prod(shape))
            lo = None if lower is None else self._ev.eval_expr(lower, td_env)
            hi = None if upper is None else self._ev.eval_expr(upper, td_env)
            self._params.append((pname, off, size, shape, lo, hi))
            off += size
        self.dim = off
        if off == 0:
            raise ValueError("stan: model has no parameters")

    # -- plumbing --------------------------------------------------------

    def _constrain_env(self, x):
        """x (unconstrained flat) -> (env incl. transformed parameters,
        total log-jacobian)."""
        env = dict(self._data_env)
        logjac = jnp.zeros(())
        for pname, off, size, shape, lo, hi in self._params:
            u = x[off : off + size]
            v, lj = _constrain_scalarwise(u, lo, hi)
            logjac = logjac + jnp.sum(lj)
            env[pname] = v.reshape(shape) if shape else v[0]
        ev = _Evaluator(self._blocks.get("functions", []))
        ev.exec_stmts(self._blocks.get("transformed parameters", []), env)
        env.pop("__target__", None)
        return env, logjac

    def log_density(self, x):
        """BridgeStan convention: model block + constraint jacobian,
        propto=false (``interface.jl:64-69``)."""
        env, logjac = self._constrain_env(x)
        env["__target__"] = jnp.zeros(())
        ev = _Evaluator(self._blocks.get("functions", []))
        ev.exec_stmts(self._blocks.get("model", []), env)
        return env["__target__"] + logjac

    def default_reference(self) -> Reference:
        d = self.dim
        return Reference(
            log_density=lambda u: jnp.sum(-0.5 * u * u - _HALF_LOG_2PI),
            sample_iid=lambda key: jax.random.normal(key, (d,)),
        )

    def default_explorer(self):
        from ..ops import AutoMALA

        return AutoMALA()  # reference interface.jl:51

    # -- extraction (param_constrain with tp + gq, state.jl:4-8) ---------

    def sample_names(self, include_tp=True, include_gq=True):
        names = []
        for pname, off, size, shape, lo, hi in self._params:
            if shape:
                names += [f"{pname}[{i}]" for i in range(size)]
            else:
                names.append(pname)
        if include_tp:
            names += self._block_var_names("transformed parameters")
        if include_gq:
            names += self._block_var_names("generated quantities")
        names.append("log_density")
        return names

    def _block_var_names(self, block):
        names = []
        env, _ = self._constrain_env(jnp.zeros(self.dim))
        ev = _Evaluator(
            self._blocks.get("functions", []), rng=np.random.default_rng(0)
        )
        ev.exec_stmts(self._blocks.get(block, []), env)
        for s in self._blocks.get(block, []):
            if s[0] == "decl":
                v = env[s[1]]
                n = int(np.prod(np.shape(v))) if np.shape(v) else 1
                if np.shape(v):
                    names += [f"{s[1]}[{i}]" for i in range(n)]
                else:
                    names.append(s[1])
        return names

    def constrained_samples(self, pt, include_tp=True, include_gq=True, seed=0):
        """Reference ``param_constrain(...; include_tp, include_gq, rng)``:
        maps the run's unconstrained samples to a dict of constrained
        parameter draws plus transformed parameters and generated
        quantities (``state.jl:4-8``)."""
        sa = np.asarray(pt.sample_array())[:, : self.dim]
        rng = np.random.default_rng(seed)
        v_constrain = jax.jit(jax.vmap(lambda x: self._constrain_env(x)[0]))
        envs = v_constrain(jnp.asarray(sa))
        out = {}
        for pname, off, size, shape, lo, hi in self._params:
            out[pname] = np.asarray(envs[pname])
        if include_tp:
            for s in self._blocks.get("transformed parameters", []):
                if s[0] == "decl":
                    out[s[1]] = np.asarray(envs[s[1]])
        if include_gq and self._blocks.get("generated quantities"):
            gq_names = [
                s[1] for s in self._blocks["generated quantities"] if s[0] == "decl"
            ]
            cols = {g: [] for g in gq_names}
            for i in range(sa.shape[0]):
                env = {
                    k: (np.asarray(v)[i] if np.ndim(v) else v)
                    for k, v in envs.items()
                }
                env = {**self._data_env, **env}
                ev = _Evaluator(self._blocks.get("functions", []), rng=rng)
                ev.exec_stmts(self._blocks["generated quantities"], env)
                for g in gq_names:
                    cols[g].append(np.asarray(env[g]))
            for g in gq_names:
                out[g] = np.stack(cols[g])
        return out


def load_stan_data(path: str) -> dict:
    """Read a Stan/CmdStan data file (JSON, e.g.
    ``examples/stan/bernoulli.data.json``)."""
    with open(path) as f:
        return json.load(f)


def stan_target(
    file: Optional[str] = None,
    source: Optional[str] = None,
    data: Optional[Any] = None,
    name: Optional[str] = None,
) -> StanTarget:
    """Build a target from a ``.stan`` file or source string; ``data`` is a
    dict or a path to a CmdStan-style JSON data file. The analogue of the
    reference's ``StanLogPotential(stan_file, data)``."""
    if (file is None) == (source is None):
        raise ValueError("pass exactly one of file= or source=")
    if file is not None:
        with open(file) as f:
            source = f.read()
        name = name or file.rsplit("/", 1)[-1].removesuffix(".stan")
    if isinstance(data, str):
        data = load_stan_data(data)
    return StanTarget(source, data=data, name=name or "stan_model")
