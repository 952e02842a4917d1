"""Sweep driver CLIs — one per reference Eval_run script.

Run as modules, e.g.::

    python -m vae_equalizer_tpu.drivers.eval_run_dp --quick
    python -m vae_equalizer_tpu.drivers.eval_run_shaping_vaele
    python -m vae_equalizer_tpu.drivers.eval_run_vaenn
    python -m vae_equalizer_tpu.drivers.eval_run_shaping_cma
    python -m vae_equalizer_tpu.drivers.eval_run_dfe

Defaults reproduce the reference workloads; results go to results/ as
incremental JSONL plus a reference-layout .mat.
"""
