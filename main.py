"""CLI entry point: ``python main.py --Model LightGCN --data_path baby``.

Thin wrapper over :mod:`chaorec_tpu.cli` providing the same invocation
surface as the reference's main.py.
"""

from chaorec_tpu.cli import main

if __name__ == "__main__":
    main()
