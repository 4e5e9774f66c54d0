"""`make test model=vit dataset=<d>` entry — delegates to eval_checkpoint."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from eval_checkpoint import main

if __name__ == "__main__":
    main()
