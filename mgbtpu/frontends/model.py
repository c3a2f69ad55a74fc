"""Modeling front end: declarative convex variational problems.

The Python-native analog of the reference's JuMP extension
(``ext/MultiGridBarrierJuMPExt``): declare field variables on a MultiGrid,
write affine expressions in them and their derivatives (with spatially
varying coefficients), add epigraph power-cone and linear inequality
constraints (optionally region-restricted), minimize an integral objective,
and read back values and central-path duals.

Example
-------
    m = Model(mg)
    u = m.variable("u")                 # conforming (differentiated / BC'd)
    s = m.variable("s", kind="broken")
    m.dirichlet(u, lambda x: x[0]**2)
    m.epigraph(s, [u.dx()], p=1.5)      # s >= |grad u|^1.5
    m.minimize(s + 0.5*u)               # min int s + u/2
    sol = m.solve(tol=1e-6)
    m.value(u), m.dual(con)

Lowering (mirrors the reference ``_lower``/``_piece``,
ext/MultiGridBarrierJuMPExt:801-1007): every variable gets an :id operator
row first (the padding pool), derivatives add rows; each cone becomes a
``convex_euclidian_power``/``convex_linear`` with square-padded distinct
index rows; multiple or region-restricted cones combine via
``convex_piecewise``. Duals are recovered from the central path:
mu_i = 1/(t_end * n * w_i * slack_i) per constraint row
(ext/MultiGridBarrierJuMPExt:1195-1331).
"""
from __future__ import annotations

import numpy as np

from ..convex import convex_euclidian_power, convex_linear, convex_piecewise
from ..solver.mgb import assemble, mgb_solve
from ..utils.errors import MGBConvergenceFailure

_OPS = ("dx", "dy", "dz")


def _as_fn(c):
    if callable(c):
        return c
    return lambda x, c=c: c


class Expr:
    """Affine expression: sum of coef(x) * term + const(x); terms are
    (varname, opsym) pairs."""

    def __init__(self, terms=None, const=None):
        self.terms = dict(terms or {})
        self.const = const

    @staticmethod
    def term(name, op):
        return Expr({(name, op): 1.0})

    def _cmb(self, other, sign):
        out = dict(self.terms)
        if isinstance(other, Expr):
            for k, c in other.terms.items():
                out[k] = _add_coef(out.get(k), c, sign)
            const = _add_const(self.const, other.const, sign)
        else:
            const = _add_const(self.const, other, sign)
        return Expr(out, const)

    def __add__(self, other):
        return self._cmb(other, +1)

    def __radd__(self, other):
        return self._cmb(other, +1)

    def __sub__(self, other):
        return self._cmb(other, -1)

    def __rsub__(self, other):
        return (-self)._cmb(other, +1)

    def __neg__(self):
        return self * (-1.0)

    def __mul__(self, c):
        cf = _as_fn(c) if callable(c) else None
        out = {}
        for k, coef in self.terms.items():
            if cf is None:
                out[k] = _scale_coef(coef, c)
            else:
                out[k] = _prod_coef(coef, cf)
        const = None
        if self.const is not None:
            const = (_scale_coef(self.const, c) if cf is None
                     else _prod_coef(self.const, cf))
        return Expr(out, const)

    __rmul__ = __mul__

    def __ge__(self, other):
        return ("ge", self - other)

    def __le__(self, other):
        return ("ge", _as_expr(other) - self)

    def eval_coef(self, key, x):
        c = self.terms.get(key)
        if c is None:
            return 0.0
        return c(x) if callable(c) else c

    def eval_const(self, x):
        if self.const is None:
            return 0.0
        return self.const(x) if callable(self.const) else self.const


def _as_expr(v):
    if isinstance(v, Expr):
        return v
    return Expr({}, v)


def _add_coef(a, b, sign):
    if a is None:
        return _scale_coef(b, sign)
    if not callable(a) and not callable(b):
        return a + sign * b
    fa, fb = _as_fn(a), _as_fn(b)
    return lambda x: fa(x) + sign * fb(x)


def _add_const(a, b, sign):
    if b is None:
        return a
    if a is None:
        return _scale_coef(b, sign)
    return _add_coef(a, b, sign)


def _scale_coef(c, s):
    if s == 1:
        return c
    if not callable(c):
        return c * s
    return lambda x: c(x) * s


def _prod_coef(c, fn):
    if not callable(c):
        return lambda x: c * fn(x)
    return lambda x: c(x) * fn(x)


class Variable(Expr):
    def __init__(self, model, name, kind):
        super().__init__({(name, "id"): 1.0})
        self.model = model
        self.name = name
        self.kind = kind

    def dx(self):
        return Expr.term(self.name, "dx")

    def dy(self):
        return Expr.term(self.name, "dy")

    def dz(self):
        return Expr.term(self.name, "dz")

    def grad(self):
        d = self.model.dim
        return [Expr.term(self.name, _OPS[i]) for i in range(d)]


class Constraint:
    def __init__(self, kind, data, region):
        self.kind = kind      # "epipower" | "linear"
        self.data = data
        self.region = region
        self.index = None     # piece index after lowering


class Model:
    """Declarative convex variational model on a MultiGrid hierarchy."""

    def __init__(self, mg):
        self.mg = mg
        self.dim = mg.geometry.discretization.dim
        self.variables: dict = {}
        self.constraints: list[Constraint] = []
        self.objective: Expr | None = None
        self._dirichlet: dict = {}
        self._start: dict = {}
        self.sol = None
        self._lowered = None
        self.status = "not_solved"

    # -- declaration ------------------------------------------------------
    def variable(self, name, kind="auto", start=None):
        """Field variable. kind: "auto" (conforming when differentiated or
        Dirichlet-constrained, else broken), "broken", "continuous",
        "uniform"."""
        if name in self.variables:
            raise ValueError(f"duplicate variable {name}")
        v = Variable(self, name, kind)
        self.variables[name] = v
        if start is not None:
            self._start[name] = _as_fn(start)
        return v

    def dirichlet(self, var, value, nodes=None):
        """Dirichlet boundary values for ``var`` (on all of the boundary, or
        on an explicit (v, e) pair list)."""
        self._dirichlet[var.name] = (_as_fn(value), nodes)

    def epigraph(self, s_expr, q_exprs, p=2.0, where=None):
        """Add the power cone  s_expr >= ||(q_exprs)||_2^p  (EpiPower)."""
        c = Constraint("epipower",
                       (_as_expr(s_expr), [_as_expr(q) for q in q_exprs],
                        float(p)), where)
        self.constraints.append(c)
        return c

    def constrain(self, ineq, where=None):
        """Add a scalar linear inequality: expr >= other / expr <= other."""
        kind, expr = ineq
        assert kind == "ge"
        c = Constraint("linear", [expr], where)
        self.constraints.append(c)
        return c

    def minimize(self, expr):
        """Objective: Min integral(expr) with expr affine in the fields."""
        self.objective = _as_expr(expr)

    # -- lowering ---------------------------------------------------------
    def _lower(self):
        from ..hierarchy.amg_build import find_boundary
        from ..hierarchy.multigrid import prepare_amg

        if self.objective is None:
            raise ValueError("no objective; call model.minimize(expr)")
        names = list(self.variables)
        used_ops = {n: {"id"} for n in names}
        all_exprs = [self.objective]
        for c in self.constraints:
            if c.kind == "epipower":
                all_exprs += [c.data[0]] + c.data[1]
            else:
                all_exprs += c.data
        for e in all_exprs:
            for (n, op) in e.terms:
                if n not in used_ops:
                    raise ValueError(f"expression references unknown variable {n}")
                used_ops[n].add(op)

        # variable kinds: conforming when differentiated or Dirichlet'd
        sv = []
        mgobj = self.mg
        dirichlet_sets = {}
        geom = mgobj.geometry
        for n in names:
            v = self.variables[n]
            kind = v.kind
            if kind == "auto":
                differentiated = any(op != "id" for op in used_ops[n])
                kind = ("continuous"
                        if differentiated or n in self._dirichlet else "broken")
            if kind == "continuous":
                _, nodes = self._dirichlet.get(n, (None, None))
                sym = f"dirichlet_{n}"
                dirichlet_sets[sym] = (find_boundary(geom)
                                       if nodes is None else list(nodes))
                sv.append((n, sym))
            elif kind == "uniform":
                sv.append((n, "uniform"))
            else:
                slack = geom.discretization.default_slack_space()
                sv.append((n, slack))
        if dirichlet_sets:
            from ..hierarchy.amg_build import amg as amg_build

            mgobj = amg_build(geom, dirichlet_nodes=dirichlet_sets)
            # merge rider subspaces from the original hierarchy if any
            for k2 in self.mg.R:
                if k2 not in mgobj.R:
                    mgobj.R[k2] = self.mg.R[k2]

        # D rows: id rows first (padding pool), then derivative rows
        D = [(n, "id") for n in names]
        row_of = {(n, "id"): i for i, n in enumerate(names)}
        for n in names:
            for op in sorted(used_ops[n] - {"id"}):
                row_of[(n, op)] = len(D)
                D.append((n, op))
        nD = len(D)
        xflat = geom.xflat()
        nnodes = xflat.shape[0]
        dtype = geom.dtype

        # objective -> f_grid
        f_grid = np.zeros((nnodes, nD), dtype=dtype)
        for key, coef in self.objective.terms.items():
            r = row_of[key]
            if callable(coef):
                for i in range(nnodes):
                    f_grid[i, r] += coef(xflat[i])
            else:
                f_grid[:, r] += coef

        # initial/boundary grid
        nu = len(names)
        g_grid = np.zeros((nnodes, nu), dtype=dtype)
        for k2, n in enumerate(names):
            fn = None
            if n in self._dirichlet:
                fn = self._dirichlet[n][0]
            if n in self._start:
                fn = self._start[n]
            if fn is not None:
                for i in range(nnodes):
                    g_grid[i, k2] = fn(xflat[i])

        # constraints -> convex pieces
        def affine_rows(exprs, nz):
            """idx (distinct rows, square-padded to nz), A fn, b fn."""
            rows = []
            for e in exprs:
                for key in e.terms:
                    r = row_of[key]
                    if r not in rows:
                        rows.append(r)
            pad = 0
            while len(rows) < nz:
                if pad >= nD:
                    raise ValueError("not enough distinct operator rows to "
                                     "square-pad the cone (add variables)")
                if pad not in rows:
                    rows.append(pad)
                pad += 1
            rows = rows[:nz] if len(rows) <= nz else rows
            if len(rows) > nz:
                raise ValueError(
                    f"cone references {len(rows)} distinct rows but has "
                    f"dimension {nz}")
            pos = {r: i for i, r in enumerate(rows)}

            def A(x):
                M = np.zeros((nz, nz))
                for i, e in enumerate(exprs):
                    for key, c in e.terms.items():
                        M[i, pos[row_of[key]]] += c(x) if callable(c) else c
                return M

            def b(x):
                return np.array([e.eval_const(x) for e in exprs])

            return tuple(rows), A, b

        pieces = []
        selects = []
        for c in self.constraints:
            if c.kind == "epipower":
                s_e, q_es, p = c.data
                nz = len(q_es) + 1
                idx, A, b = affine_rows(q_es + [s_e], nz)
                Q = convex_euclidian_power(mgobj, idx=idx, A=A, b=b, p=p,
                                           dtype=dtype)
            else:
                exprs = c.data
                rows = []
                for e in exprs:
                    for key in e.terms:
                        r = row_of[key]
                        if r not in rows:
                            rows.append(r)
                pos = {r: i for i, r in enumerate(rows)}

                def A(x, exprs=exprs, rows=rows, pos=pos):
                    M = np.zeros((len(exprs), len(rows)))
                    for i, e in enumerate(exprs):
                        for key, cf in e.terms.items():
                            M[i, pos[row_of[key]]] += \
                                cf(x) if callable(cf) else cf
                    return M

                def b(x, exprs=exprs):
                    return np.array([e.eval_const(x) for e in exprs])

                Q = convex_linear(mgobj, idx=tuple(rows), A=A, b=b,
                                  dtype=dtype)
            c.index = len(pieces)
            pieces.append(Q)
            selects.append(c.region)

        if not pieces:
            raise ValueError("the model has no constraints; the barrier "
                             "method needs a bounded convex domain")
        if len(pieces) == 1 and selects[0] is None:
            Q_all = pieces[0]
        else:
            def select(x):
                return tuple(1.0 if (r is None or r(x)) else 0.0
                             for r in selects)

            Q_all = convex_piecewise(tuple(pieces), mg=mgobj, select=select)

        prob = assemble(mgobj, state_variables=sv, D=D, f_grid=f_grid,
                        g_grid=g_grid, Q=Q_all, dtype=dtype)
        self._lowered = dict(names=names, D=D, row_of=row_of, prob=prob,
                             mgobj=mgobj, pieces=pieces, selects=selects)
        return prob

    # -- solve / results --------------------------------------------------
    def solve(self, **kwargs):
        prob = self._lower()
        try:
            self.sol = mgb_solve(prob, **kwargs)
            self.status = "optimal"
        except MGBConvergenceFailure as e:
            self.status = {"infeasible": "infeasible",
                           "feasibility_Rmax": "infeasible_or_unbounded",
                           "stall": "slow_progress",
                           "iteration_limit": "iteration_limit"}.get(
                               e.code, "numerical_error")
            raise
        return self.sol

    def value(self, var):
        if self.sol is None:
            raise ValueError("solve first")
        k = self._lowered["names"].index(var.name)
        return np.asarray(self.sol.z[:, k])

    def objective_value(self):
        L = self._lowered
        prob = L["prob"]
        M1 = prob.M[0]
        z = np.asarray(self.sol.z).T.reshape(-1)
        Dz = M1.apply_D_full(z)
        return float(np.sum(M1.w[:, None] * prob.f_grid * Dz))

    def dual(self, constraint):
        """Central-path multipliers per node for a linear constraint (rows)
        or the cone slack multiplier for an epigraph constraint:
        mu_i = 1/(t_end * n * w_i * slack_i)."""
        L = self._lowered
        prob = L["prob"]
        M1 = prob.M[0]
        t_end = float(self.sol.SOL_main["ts"][-1])
        n = M1.n_nodes
        w = M1.w
        z = np.asarray(self.sol.z).T.reshape(-1)
        Dz = M1.apply_D_full(z)
        Q = L["pieces"][constraint.index]
        import jax

        slack = np.asarray(jax.vmap(Q.slack)(*Q.args,
                                             np.asarray(Dz, dtype=Dz.dtype)))
        resid = -slack     # positive margin
        mu = 1.0 / (t_end * n * np.where(w > 0, w, np.inf) * np.maximum(
            resid, 1e-300))
        return mu
