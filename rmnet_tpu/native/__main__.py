import sys
from rmnet_tpu.native import build
path = build(force="--force" in sys.argv)
print(f"built {path}")
