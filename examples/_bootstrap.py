"""Make `python examples/<script>.py` work from a source checkout.

When run as a script, sys.path[0] is `examples/`, not the repo root, so
`differential_equations_resnet_tpu` is not importable unless the package
is pip-installed.  Importing this module (examples/ IS sys.path[0]) adds
the repo root ahead of site-packages only when the package is missing.
"""

import importlib.util
import os
import sys

if importlib.util.find_spec("differential_equations_resnet_tpu") is None:
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
