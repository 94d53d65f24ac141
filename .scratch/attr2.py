"""Device-op attribution of canonicalize-only, EQUIADAPT_NCHW_SPINE=never."""
import os, sys
os.environ["EQUIADAPT_NCHW_SPINE"] = "never"
exec(open("/root/repo/.scratch/attr.py").read())
