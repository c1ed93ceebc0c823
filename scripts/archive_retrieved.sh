#!/bin/bash
# Archive / upload retrieved-image trees and dataset folders.
#
# TPU-native equivalent of the reference's backup_scripts/
# (zip_retrieved_images.sh, upload_zipped_images_gdrive.sh,
# upload_gdrive.sh): one parameterized tool instead of three scripts with
# hard-coded /scratch paths.
#
#   archive_retrieved.sh zip    <retrieved_root> [out_dir]
#       zip every "<ds>_retrieved_*" folder under <retrieved_root> into
#       out_dir (default <retrieved_root>/zipped_images), preserving the
#       reference's (cd parent && zip -r out name) layout so archives
#       unpack to the same tree.
#   archive_retrieved.sh upload <dir> <rclone_remote> [--zips-only]
#       rclone-copy a directory to a remote (gdrive or any rclone target).
#       --zips-only mirrors upload_zipped_images_gdrive.sh (--include
#       "*.zip"); otherwise mirrors upload_gdrive.sh (--max-depth 1,
#       --exclude "*.pkl").
#
# rclone is optional and probed at runtime; zip falls back to python's
# zipfile when the zip binary is absent (this image has no zip/rclone).
set -euo pipefail

cmd="${1:?usage: archive_retrieved.sh zip|upload ...}"; shift
case "$cmd" in
  zip)
    root="${1:?retrieved root}"; out="${2:-$root/zipped_images}"
    mkdir -p "$out"
    # canonicalize: the zip branch cd's into $parent, so a relative
    # out_dir/root would resolve against $parent instead of the caller's
    # cwd (and the python fallback would disagree)
    out="$(cd "$out" && pwd)"
    root="$(cd "$root" && pwd)"
    find "$root" -maxdepth 2 -type d -name '*_retrieved_*' | while read -r folder; do
      name="$(basename "$folder")"; parent="$(dirname "$folder")"
      echo "Zipping $folder -> $out/$name.zip"
      if command -v zip >/dev/null 2>&1 && [ -z "${ARCHIVE_FORCE_PY:-}" ]; then
        (cd "$parent" && zip -qr "$out/$name.zip" "$name")
      else
        # fallback mirrors `zip -r` layout incl. directory entries for
        # empty dirs; force with ARCHIVE_FORCE_PY=1 (tested both ways)
        python - "$parent" "$name" "$out/$name.zip" <<'PY'
import os, sys, zipfile
parent, name, dest = sys.argv[1:]
with zipfile.ZipFile(dest, "w", zipfile.ZIP_DEFLATED) as z:
    for dirpath, dirnames, files in os.walk(os.path.join(parent, name)):
        if not files and not dirnames:
            z.writestr(os.path.relpath(dirpath, parent) + "/", "")
        for f in files:
            p = os.path.join(dirpath, f)
            z.write(p, os.path.relpath(p, parent))
PY
      fi
    done
    ;;
  upload)
    src="${1:?source dir}"; remote="${2:?rclone remote}"
    command -v rclone >/dev/null 2>&1 || {
      echo "rclone not installed — install it or copy $src manually" >&2; exit 1; }
    if [ "${3:-}" = "--zips-only" ]; then
      rclone copy "$src" "$remote" --include "*.zip" -P
    else
      rclone copy "$src" "$remote" --max-depth 1 --exclude "*.pkl" -P
    fi
    ;;
  *) echo "unknown command: $cmd" >&2; exit 1 ;;
esac
