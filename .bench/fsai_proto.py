import sys; sys.path.insert(0, "/root/repo")
import jax; jax.config.update("jax_platforms","cpu")
import numpy as np, jax.numpy as jnp, math, time
import scipy.sparse as sp
from mgbtpu import amg, assemble, fem2d_P2, subdivide
from mgbtpu.solver.mgb import _kernels_for, barrier_weights
from mgbtpu.solver.newton import linesearch_backtracking
from mgbtpu.solver.levelops import gram_diag, gram_matvec

L = int(sys.argv[1]) if len(sys.argv) > 1 else 6
T = float(sys.argv[2]) if len(sys.argv) > 2 else 316.0
g = subdivide(fem2d_P2(dtype=np.float32), L); mg = amg(g)
prob = assemble(mg, p=1.0, dtype=np.float32)
M1 = prob.M[0]
kern = _kernels_for(M1, prob.Q.barrier, linesearch_backtracking(), np.float32)
ops = kern.ops(M1.depth - 1)
z0 = np.asarray(prob.g_grid, np.float64).T.reshape(-1)
Dz0 = kern._Dz0_for(z0)
f1, f2 = kern.fns[1], kern.fns[2]
w = M1.w.astype(np.float32); c = np.asarray(prob.f_grid, np.float32)
wc = jnp.asarray(w[:,None]*(T*c)); bw = jnp.asarray(barrier_weights(M1.w, None).astype(np.float32))
s0 = jnp.zeros((ops.n_J,), jnp.float32)
H = f2(s0, ops, Dz0, wc, bw, *prob.Q.args)
gv = f1(s0, ops, Dz0, wc, bw, *prob.Q.args)
b = np.asarray(gv.hi + gv.lo, np.float64)
n = ops.n_J

# assemble sparse H (host, f64 reference) from element Gram blocks
Lnode = np.asarray(H.Lnode, np.float64)
panels = np.asarray(ops.panels, np.float64)
cols = np.asarray(ops.cols)
N, p, nD, C = ops.N, ops.p, ops.nD, ops.C
Lr = Lnode.reshape(N, p, nD, nD)
B = np.einsum("jNpc,Npji->Npic", panels, Lr)
Bf = B.reshape(N, p*nD, C)
He = np.einsum("Nkc,Nkd->Ncd", Bf, Bf)          # (N, C, C)
rows = np.repeat(cols[:,:,None], C, 2).ravel()
colsf = np.repeat(cols[:,None,:], C, 1).ravel()
Hs = sp.coo_matrix((He.ravel(), (rows, colsf)), shape=(n, n)).tocsr()
d = np.sqrt(Hs.diagonal()); dinv = np.where(d>0, 1/d, 1.0)
Heq = sp.diags(dinv) @ Hs @ sp.diags(dinv)
Heq = Heq.tocsr()
print("n", n, "nnz/row", Heq.nnz/n, flush=True)

# FSAI pattern = lower triangle of Heq
Hl = sp.tril(Heq, 0).tocsr()
kmax = int(np.diff(Hl.indptr).max())
print("kmax(lower)", kmax, flush=True)
t0 = time.time()
G = sp.lil_matrix((n, n))
Hcsc = Heq.tocsc()
# build per-row (vector reference implementation, f64 host)
indptr, indices = Hl.indptr, Hl.indices
for i in range(n):
    J = indices[indptr[i]:indptr[i+1]]
    Bi = Heq[np.ix_(J, J)].toarray()
    e = np.zeros(len(J)); e[-1] = 1.0
    try:
        gi = np.linalg.solve(Bi + 1e-7*np.eye(len(J)), e)
    except np.linalg.LinAlgError:
        gi = e
    s = gi[-1]
    gi = gi / math.sqrt(max(s, 1e-30))
    G[i, J] = gi
G = G.tocsr()
print("fsai build", round(time.time()-t0,1), "s", flush=True)

def cg_count(Mop, tag, tol=1e-5, cap=3000):
    dt = d.copy()
    def mv(u): return np.asarray(gram_matvec(ops, H.Lnode, jnp.asarray((u/dt).astype(np.float32))), np.float64)/dt
    bs = b/dt; x = np.zeros_like(bs); r = bs.copy(); z = Mop(r); p2 = z.copy(); rz = r@z
    k=0
    while math.sqrt(r@r) > tol*math.sqrt(bs@bs) and k < cap:
        Hp = mv(p2); a = rz/(p2@Hp); x += a*p2; r -= a*Hp
        z = Mop(r); rz2 = r@z; p2 = z + (rz2/rz)*p2; rz = rz2; k+=1
    print(f"{tag}: cg its {k}", flush=True)

cg_count(lambda r: r, "jacobi(diag)")
cg_count(lambda r: G.T @ (G @ r), "FSAI(H-pattern)")
# FSAI with squared pattern (denser)
t0=time.time()
H2 = (Heq @ Heq).tocsr(); H2l = sp.tril(H2, 0).tocsr()
print("kmax2", int(np.diff(H2l.indptr).max()), flush=True)
