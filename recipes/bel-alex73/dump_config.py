"""Dump the Belarusian Glow-TTS recipe config as JSON (behavioral mirror of
/root/reference/recipes/bel-alex73/dump_config.py)."""

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from train_glowtts import config

if __name__ == "__main__":
    s = json.dumps(config.to_dict(), indent=2, default=str)
    s = re.sub(r'"test_sentences":\s*\[\],', "", s)
    print(s)
