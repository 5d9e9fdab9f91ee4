"""``python -m voxelhashing_demo_tpu`` — CLI entry (reference: DepthMain.cpp)."""

from .cli import main

main()
