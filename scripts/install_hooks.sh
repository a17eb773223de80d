#!/bin/sh
# Install the repo's git hooks (run once per clone).
cd "$(git rev-parse --show-toplevel)" || exit 1
# resolve the REAL hooks dir: in a linked worktree .git is a file and
# hooks live in the common dir; core.hooksPath overrides both — the
# old hardcoded .git/hooks silently failed there while still printing
# the success message
hooks_dir="$(git config core.hooksPath || true)"
if [ -z "$hooks_dir" ]; then
    hooks_dir="$(git rev-parse --git-common-dir)/hooks"
fi
mkdir -p "$hooks_dir" || exit 1
if ln -sf "$(pwd)/scripts/pre-commit.sh" "$hooks_dir/pre-commit"; then
    echo "installed $hooks_dir/pre-commit -> scripts/pre-commit.sh"
else
    echo "FAILED to install pre-commit hook into $hooks_dir" >&2
    exit 1
fi
