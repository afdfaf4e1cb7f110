"""`python -m dg_tta_tpu.cli` entry point (same surface as the `dgtta`
console script; reference CLI: /root/reference/dg_tta/run.py:119-156)."""
from dg_tta_tpu.cli.main import main

if __name__ == "__main__":
    main()
