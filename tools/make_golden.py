"""Generate golden parity fixtures from the reference implementation.

Runs the PyTorch reference (mounted read-only at /root/reference) on small,
deterministic inputs and records inputs + outputs to tests/golden/*.npz.
The test-suite then checks that the JAX/TPU implementations reproduce these
numbers. This script is only runnable where the reference is mounted; the
generated .npz files are committed so the tests are self-contained.

Usage: python tools/make_golden.py
"""

from __future__ import annotations

import sys
import pathlib

import numpy as np
import torch

REF = pathlib.Path("/root/reference")
OUT = pathlib.Path(__file__).resolve().parent.parent / "tests" / "golden"
OUT.mkdir(parents=True, exist_ok=True)

sys.path.insert(0, str(REF / "optical_DP_channel"))
sys.path.insert(0, str(REF / "AWGN_channel"))

# numpy>=2 removed Inf from numpy.core.numeric; the reference (written for
# numpy 1.x) imports it — shim it so the reference is importable unmodified.
import numpy.core.numeric as _ncn  # noqa: E402

if not hasattr(_ncn, "Inf"):
    _ncn.Inf = np.inf

import shared_funcs as sfun  # noqa: E402  (reference DP library)
import func_VAELE_MQAM_shaping as vaele  # noqa: E402
import func_VAENN_MQAM as vaenn  # noqa: E402
import func_CMA_MQAM_shaping as cma_awgn  # noqa: E402

torch.manual_seed(0)
rng = np.random.default_rng(1234)


def save(name, **arrs):
    np.savez(OUT / f"{name}.npz", **{k: np.asarray(v) for k, v in arrs.items()})
    print(f"wrote {name}.npz: " + ", ".join(f"{k}{np.asarray(v).shape}" for k, v in arrs.items()))


# ---------------------------------------------------------------- filters
save(
    "filters",
    rrc_T8_sps2_b01=sfun.rrcfir(8, 2, 0.1),
    rc_T8_sps2_b01=sfun.rcfir(8, 2, 0.1),
    rrc_T8_sps1_b01=sfun.rrcfir(8, 1, 0.1),
    rc_T8_sps1_b01=sfun.rcfir(8, 1, 0.1),
    rrc_T6_sps4_b025=sfun.rrcfir(6, 4, 0.25),
)

# ---------------------------------------------------------------- init / constellation
for mod in ["4-QAM", "16-QAM", "64-QAM"]:
    for nu in [0.0, 0.0270955, 0.1222578]:
        h_est, h_channel, P, amp_levels, amps, pol, nu_sc, var, pow_mean = sfun.init(
            "h1", mod, "cpu", nu, 2, 25, 23.0
        )
        save(
            f"init_{mod}_{nu}",
            P=P,
            amps=amps,
            nu_sc=np.float64(nu_sc),
            var=var.numpy(),
            pow_mean=np.float64(pow_mean),
            h_channel=h_channel,
            h_est=h_est.detach().numpy(),
        )

# ---------------------------------------------------------------- DP ELBO loss
_, _, P, amp_levels, amps, pol, nu_sc, var, pow_mean = sfun.init("h0", "64-QAM", "cpu", 0.0270955, 2, 25, 23.0)
num_lev = amp_levels.shape[0]
N_sym = 64
sps = 2
N = N_sym * sps
q_logits = rng.normal(size=(2, 2 * num_lev, N_sym)).astype(np.float32)
q = torch.from_numpy(q_logits)
q = torch.cat(
    [torch.softmax(q[:, :num_lev, :], dim=1), torch.softmax(q[:, num_lev:, :], dim=1)], dim=1
)
rx = torch.from_numpy(rng.normal(size=(2, 2, N)).astype(np.float32))
h_est = torch.from_numpy(rng.normal(size=(2, 2, 2, 25)).astype(np.float32) * 0.1)
P_t = torch.from_numpy(P.astype(np.float32))
loss, var_est = sfun.loss_function_shaping(q, rx, h_est, amp_levels, P_t)
save(
    "elbo_dp",
    q=q.numpy(),
    rx=rx.numpy(),
    h_est=h_est.numpy(),
    amp_levels=amp_levels.numpy(),
    P=P_t.numpy(),
    loss=loss.item(),
    var_est=var_est.numpy(),
)

# ---------------------------------------------------------------- SISO ELBO (shaped + uniform)
amps_np = amp_levels.numpy()
q1 = torch.from_numpy(rng.normal(size=(2 * num_lev, N_sym)).astype(np.float32))
q1 = torch.cat([torch.softmax(q1[:num_lev], dim=0), torch.softmax(q1[num_lev:], dim=0)], dim=0)
rx1 = torch.from_numpy(rng.normal(size=(2, N)).astype(np.float32))
h1_est = torch.from_numpy(rng.normal(size=(2, 25)).astype(np.float32) * 0.1)
loss_shaped = vaele.loss_function(q1, rx1, h1_est, "cpu", amp_levels, P_t)
loss_uniform = vaenn.loss_function(q1, rx1, h1_est, "cpu", amp_levels)
save(
    "elbo_siso",
    q=q1.numpy(),
    rx=rx1.numpy(),
    h_est=h1_est.numpy(),
    amp_levels=amps_np,
    P=P_t.numpy(),
    loss_shaped=loss_shaped.item(),
    loss_uniform=loss_uniform.item(),
)

# ---------------------------------------------------------------- twoXtwoFIR forward
net = sfun.twoXtwoFIR(25, sps)
w = rng.normal(size=(2, 4, 25)).astype(np.float32) * 0.2
with torch.no_grad():
    net.conv_w.weight.copy_(torch.from_numpy(w))
x = torch.from_numpy(rng.normal(size=(2, 2, N)).astype(np.float32))
with torch.no_grad():
    q_est, out = net(x, amp_levels, var, nu_sc)
save(
    "twoxtwofir",
    w=w,
    x=x.numpy(),
    amp_levels=amps_np,
    var=var.numpy(),
    nu_sc=np.float64(nu_sc),
    q_est=q_est.numpy(),
    out=out.numpy(),
)

# ---------------------------------------------------------------- soft_dec
out_sd = torch.from_numpy(rng.normal(size=(2, 2, N_sym)).astype(np.float32))
q_sd = sfun.soft_dec(out_sd, var, amp_levels, nu_sc)
save("soft_dec", out=out_sd.numpy(), var=var.numpy(), amp_levels=amps_np, nu_sc=np.float64(nu_sc), q=q_sd.numpy())

# ---------------------------------------------------------------- twoFIR (SISO VAE-LE) forward
net1 = vaele.twoFIR(25, sps)
w1 = rng.normal(size=(1, 2, 25)).astype(np.float32) * 0.2
with torch.no_grad():
    net1.conv_w.weight.copy_(torch.from_numpy(w1))
x1 = torch.from_numpy(rng.normal(size=(2, N)).astype(np.float32))
amp_mean = 0.61  # arbitrary but fixed
var_s = 10 ** (-22.0 / 10)
with torch.no_grad():
    q_est1, out1 = net1(x1, amp_levels, amp_mean, var_s)
save(
    "twofir",
    w=w1,
    x=x1.numpy(),
    amp_levels=amps_np,
    amp_mean=np.float64(amp_mean),
    var=np.float64(var_s),
    q_est=q_est1.numpy(),
    out=out1.numpy(),
)

# ---------------------------------------------------------------- VAE-NN Net forward
netn = vaenn.Net(25, 3, num_lev, sps)
sd = netn.state_dict()
tensors = {}
for k in sd:
    t = rng.normal(size=tuple(sd[k].shape)).astype(np.float32) * 0.1
    tensors[k] = t
netn.load_state_dict({k: torch.from_numpy(v) for k, v in tensors.items()})
xn = torch.from_numpy(rng.normal(size=(1, 2, N)).astype(np.float32))
with torch.no_grad():
    outn = netn(xn)
save(
    "vaenn_net",
    x=xn.numpy(),
    out=outn.numpy(),
    **{k.replace(".", "_"): v for k, v in tensors.items()},
)

# ---------------------------------------------------------------- CMA AWGN (scalar)
h0 = np.zeros((2, 11), np.float32)
h0[0, 5] = 1.0
Rx = rng.normal(size=(2, 2 * 50)).astype(np.float32)
out_c, h_c, e_c = cma_awgn.CMA(torch.from_numpy(Rx.copy()), 1.0, torch.from_numpy(h0.copy()), 1e-3, 2, True)
save("cma_awgn", Rx=Rx, h0=h0, lr=np.float64(1e-3), out=out_c.numpy(), h=h_c.numpy(), e=e_c.numpy())

# ---------------------------------------------------------------- CMA DP variants
h0d = np.zeros((2, 2, 2, 11), np.float32)
h0d[0, 0, 0, 5] = 1.0
h0d[1, 1, 0, 5] = 1.0
Rxd = rng.normal(size=(2, 2, 2 * 60)).astype(np.float32)
out_d, h_d, e_d = sfun.CMA(torch.from_numpy(Rxd.copy()), 1.0, torch.from_numpy(h0d.copy()), 1e-3, 2, True)
save("cma_dp", Rx=Rxd, h0=h0d, lr=np.float64(1e-3), out=out_d.numpy(), h=h_d.numpy(), e=e_d.numpy())

out_b, h_b, e_b = sfun.CMAbatch(torch.from_numpy(Rxd.copy()), 1.0, torch.from_numpy(h0d.copy()), 1e-3, 10, 2, True)
save("cmabatch_dp", Rx=Rxd, h0=h0d, lr=np.float64(1e-3), batchlen=10, out=out_b.numpy(), h=h_b.numpy(), e=e_b.numpy())

out_f, h_f, e_f = sfun.CMAflex(
    torch.from_numpy(Rxd.copy()), 1.0, torch.from_numpy(h0d.copy()), 1e-3, 10, 5, 2, True
)
save(
    "cmaflex_dp",
    Rx=Rxd,
    h0=h0d,
    lr=np.float64(1e-3),
    batchlen=10,
    symb_step=5,
    out=out_f.numpy(),
    h=h_f.numpy(),
    e=e_f.numpy(),
)

# ---------------------------------------------------------------- CPE
yd = rng.normal(size=(2, 2, 1200)).astype(np.float32)
y_corr = sfun.CPE(torch.from_numpy(yd.copy()))
save("cpe_dp", y=yd, y_corr=y_corr.numpy())

ya = rng.normal(size=(2, 1200)).astype(np.float32)
y_corr_a = cma_awgn.CPE(torch.from_numpy(ya.copy()))
save("cpe_awgn", y=ya, y_corr=y_corr_a.numpy())

# ---------------------------------------------------------------- SER metrics
Nser = 400
tx_idx = rng.integers(0, num_lev, size=(2, 2, Nser))
tx_amp = amps_np[tx_idx].astype(np.float16)  # reference keeps tx as float16 levels
q_r = torch.from_numpy(rng.normal(size=(2, 2 * num_lev, Nser)).astype(np.float32))
q_r = torch.cat([torch.softmax(q_r[:, :num_lev], dim=1), torch.softmax(q_r[:, num_lev:], dim=1)], dim=1)
ser_iq = sfun.SER_IQflip(q_r, torch.from_numpy(tx_amp))
rx_c = torch.from_numpy((amps_np[tx_idx] + 0.05 * rng.normal(size=tx_idx.shape)).astype(np.float32))
ser_cs = sfun.SER_constell_shaping(rx_c.clone(), torch.from_numpy(tx_amp), amp_levels, nu_sc, var)
save(
    "ser_dp",
    q=q_r.numpy(),
    tx=tx_amp.astype(np.float32),
    rx=rx_c.numpy(),
    nu_sc=np.float64(nu_sc),
    var=var.numpy(),
    amp_levels=amps_np,
    ser_iqflip=ser_iq.numpy(),
    ser_constell=ser_cs.numpy(),
)

tx1_idx = rng.integers(0, num_lev, size=(2, Nser))
tx1_amp = amps_np[tx1_idx].astype(np.float16)
q1_r = torch.from_numpy(rng.normal(size=(2 * num_lev, Nser)).astype(np.float32))
q1_r = torch.cat([torch.softmax(q1_r[:num_lev], dim=0), torch.softmax(q1_r[num_lev:], dim=0)], dim=0)
ser_q = vaele.SER_q(q1_r, torch.from_numpy(tx1_amp), sps, num_lev, "cpu")
rx1_c = torch.from_numpy((amps_np[tx1_idx] + 0.05 * rng.normal(size=tx1_idx.shape)).astype(np.float32))
ser_cma = cma_awgn.SER_CMA(rx1_c.clone(), torch.from_numpy(tx1_amp), sps, amp_levels, num_lev, "cpu")
save(
    "ser_siso",
    q=q1_r.numpy(),
    tx=tx1_amp.astype(np.float32),
    rx=rx1_c.numpy(),
    amp_levels=amps_np,
    ser_q=np.float64(ser_q.item()),
    ser_cma=np.float64(ser_cma.item()),
)

# ---------------------------------------------------------------- find_shift
true_shift = 3
Nfs = 2000
tx_fs_idx = rng.integers(0, num_lev, size=(2, 2, Nfs))
tx_fs = amps_np[tx_fs_idx]
# build q that peaks at the tx symbol, delayed by true_shift, pols swapped
q_fs = np.full((2, 2 * num_lev, Nfs), 0.01, np.float32)
for p in range(2):
    for c in range(2):
        idx = np.roll(tx_fs_idx[1 - p, c], true_shift)
        q_fs[p, c * num_lev + idx, np.arange(Nfs)] = 1.0
q_fs = q_fs / q_fs.sum(axis=1, keepdims=True) * 2  # not normalized per half; fine for corr
shift_ref, r_ref = sfun.find_shift(
    torch.from_numpy(q_fs), torch.from_numpy(tx_fs.astype(np.float16)), 21, amp_levels, 2
)
out_fs = np.stack([np.roll(tx_fs[1 - p], true_shift, axis=-1) for p in range(2)]).astype(np.float32)
shift2_ref, r2_ref = sfun.find_shift_symb_full(
    torch.from_numpy(out_fs), torch.from_numpy(tx_fs.astype(np.float16)), 21
)
save(
    "find_shift",
    q=q_fs,
    tx=tx_fs.astype(np.float32),
    out=out_fs,
    amp_levels=amps_np,
    shift=shift_ref.numpy(),
    r=np.int64(r_ref),
    shift_symb=shift2_ref.numpy(),
    r_symb=np.int64(r2_ref),
)

# ---------------------------------------------------------------- LMMSE / DFE filters
import importlib.util  # noqa: E402

spec = importlib.util.spec_from_file_location("dfe_ref_guard", REF / "AWGN_channel" / "DFE_MQAM_shaping.py")
# DFE_MQAM_shaping.py executes a full sweep at import; instead re-use its pure
# functions by extracting them via exec of the function defs only is fragile —
# so recompute via the same torch calls published in the module source using a
# minimal sandbox import (channel + functions only).
import types  # noqa: E402

src = (REF / "AWGN_channel" / "DFE_MQAM_shaping.py").read_text()
# keep everything before the "MAIN PART" marker (setup + function defs only)
src_head = src.split("################################## MAIN PART")[0]
mod_dfe = types.ModuleType("dfe_ref")
mod_dfe.__dict__["__name__"] = "dfe_ref"
exec(compile(src_head, "DFE_MQAM_shaping_head.py", "exec"), mod_dfe.__dict__)

h_tensor = mod_dfe.h_tensor
lmmse_taps = mod_dfe.compute_lmmse(h_tensor, 18.0, 20, 11)
ff = mod_dfe.compute_feedforward(h_tensor, 18.0, 11)
fb = mod_dfe.compute_feedback_filter(h_tensor, ff)
save(
    "lmmse_dfe",
    h_real=h_tensor.real.numpy(),
    h_imag=h_tensor.imag.numpy(),
    snr=np.float64(18.0),
    lmmse_real=lmmse_taps.real.numpy(),
    lmmse_imag=lmmse_taps.imag.numpy(),
    ff_real=ff.real.numpy(),
    ff_imag=ff.imag.numpy(),
    fb_real=fb.real.numpy(),
    fb_imag=fb.imag.numpy(),
)

# dfe decision loop golden
rx_dfe = torch.from_numpy((rng.normal(size=300) + 1j * rng.normal(size=300)).astype(np.complex64))
ff_out = mod_dfe.compl_conv(rx_dfe, ff)
init_idx = mod_dfe.nearest_neighbor(ff_out)
dfe_idx = mod_dfe.dfe(ff_out, ff, fb, init_idx)
save(
    "dfe_loop",
    rx_real=rx_dfe.real.numpy(),
    rx_imag=rx_dfe.imag.numpy(),
    ff_out_real=ff_out.real.numpy(),
    ff_out_imag=ff_out.imag.numpy(),
    init_idx=init_idx.numpy(),
    dfe_idx=dfe_idx.numpy(),
)

print("all golden fixtures written to", OUT)
