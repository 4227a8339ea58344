#!/usr/bin/env python
"""Entry point: ``python bin/main.py {fit,test,predict} --config …``.

(reference: bin/main.py:11-12 — wires the training module and the data
module into the CLI)
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from py4cast_tpu.utils import apply_env_platform  # noqa: E402

apply_env_platform()

from py4cast_tpu.cli import main  # noqa: E402
from py4cast_tpu.parallel.mesh import maybe_init_distributed  # noqa: E402

if __name__ == "__main__":
    maybe_init_distributed()
    sys.exit(main())
