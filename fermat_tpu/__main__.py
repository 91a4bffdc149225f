from fermat_tpu.utils.cli import main
import sys

sys.exit(main())
