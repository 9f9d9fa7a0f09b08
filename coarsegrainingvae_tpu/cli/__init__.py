"""Command-line drivers mirroring the reference's scripts/ entry points
(run_ala.py, run_diffpool.py, run_baseline.py, run_pdb.py, opt.py)."""
