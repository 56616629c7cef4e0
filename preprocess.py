#!/usr/bin/env python
"""Build filelists from a wav directory tree -- same CLI as the reference:

    python preprocess.py --wav_dir ./wav_dirs --filelists filelists/train_files_ss.txt

(reference preprocess.py:1-15, README.md:30). Appends every ``**/*.wav`` under
``wav_dir`` to the filelist, one path per line. ``--speaker_map`` optionally
appends ``|<sid>`` per path using the immediate parent directory name as the
speaker key (multi-speaker training with real speaker conditioning).
"""

import argparse
import json
import os
from glob import glob

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--wav_dir", default="./wav_dirs")
    parser.add_argument("--filelists", default="filelists/train_files_ss.txt")
    parser.add_argument(
        "--speaker_map", default=None,
        help="optional JSON file mapping parent-dir name -> integer speaker id; "
             "when set, lines are written as path|sid",
    )

    args = parser.parse_args()

    speaker_map = None
    if args.speaker_map:
        with open(args.speaker_map, encoding="utf-8") as f:
            speaker_map = json.load(f)

    filenames = glob("{}/**/*.wav".format(args.wav_dir), recursive=True)
    print("start")
    os.makedirs(os.path.dirname(args.filelists) or ".", exist_ok=True)
    with open(args.filelists, "a", encoding="utf-8") as f:
        for filename in filenames:
            if speaker_map is not None:
                sid = speaker_map[os.path.basename(os.path.dirname(filename))]
                f.write(f"{filename}|{sid}\n")
            else:
                f.write(filename + "\n")
    print(f"wrote {len(filenames)} entries to {args.filelists}")
