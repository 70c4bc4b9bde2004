"""CLI — drop-in surface of the reference ``run.py``.

Thin wrapper over :mod:`alg_tpu.cli` (the installed ``alg-tpu`` console
script) so ``python run.py --config ... --image_path ...`` works exactly as
in the reference repo (``run.py:137-144``).
"""

from alg_tpu.cli import build_parser, run as _run


def main(args):
    _run(args)


if __name__ == "__main__":
    main(build_parser().parse_args())
