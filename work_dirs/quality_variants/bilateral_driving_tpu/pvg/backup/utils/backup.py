"""Source-tree backup per run (reference project/utils/backup.py:39-56):
copy the framework's .py/.yaml sources into log_dir/backup for
reproducibility."""
from __future__ import annotations

import os
import shutil


def backup_project(log_dir: str, source_root: str | None = None,
                   exts=(".py", ".yaml", ".md")):
    if source_root is None:
        source_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    dst_root = os.path.join(log_dir, "backup")
    for root, dirs, files in os.walk(source_root):
        dirs[:] = [d for d in dirs if d not in
                   ("__pycache__", ".git", "work_dirs")]
        for f in files:
            if os.path.splitext(f)[1] in exts:
                src = os.path.join(root, f)
                rel = os.path.relpath(src, source_root)
                dst = os.path.join(dst_root, rel)
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                shutil.copy2(src, dst)
    return dst_root
