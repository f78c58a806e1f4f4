#!/bin/bash
# Kaldi-style "--flag value" option parsing for recipe shells: each
# --name value pair overwrites the shell variable $name (which must
# already have a default).  Same convention as the reference's
# tools/parse_options.sh; fresh implementation.

while true; do
  case "${1:-}" in
    --*)
      name=$(echo "$1" | sed s/^--// | sed s/-/_/g)
      if eval '[ -z "${'$name'+x}" ]'; then
        echo "parse_options.sh: unknown option $1" >&2
        exit 1
      fi
      eval $name=\"$2\"
      shift 2
      ;;
    *) break ;;
  esac
done
true
