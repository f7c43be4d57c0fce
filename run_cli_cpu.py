import sys
import jax
jax.config.update("jax_platforms", "cpu")
sys.argv = ["slam_demo",
            "--fusion", "nerf", "--eval", "--gui", "--stereo",
            "--n_frames", "10", "--buffer", "8",
            "--height", "96", "--width", "128",
            "--weights", "weights_synthetic.npz",
            "--out", "/tmp/verify_results.csv",
            "--viz_out", "/tmp/verify_viz"]
from nerf_slam_tpu.cli.slam_demo import parse_args, run
run(parse_args(sys.argv[1:]))
