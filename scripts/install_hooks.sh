#!/bin/sh
# Install the repo's git hooks (run once per clone).
cd "$(git rev-parse --show-toplevel)" || exit 1
ln -sf ../../scripts/pre-commit.sh .git/hooks/pre-commit
echo "installed .git/hooks/pre-commit -> scripts/pre-commit.sh"
