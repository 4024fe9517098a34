"""``python -m scl_deepfake_audio_detection_tpu.cli`` entry point."""

from . import main

raise SystemExit(main())
