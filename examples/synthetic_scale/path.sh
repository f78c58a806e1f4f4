export PATH=$PWD:$PATH

# Make the repo-root wekws_tpu package importable when the recipe is run
# from this directory (reference: examples/*/s0/path.sh).
export PYTHONIOENCODING=UTF-8
export PYTHONPATH=../../:$PYTHONPATH
