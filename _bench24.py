import sys
sys.argv = ["bench_suite.py"]
import bench_suite as bs
bs.run_config("2_4k_ictcp_saliency", 3840, 2160, 256,
              dither=False, tile_size=512, kmeans_niter=0, color_space=2)
bs.run_config("4_4k_dither", 3840, 2160, 256,
              dither=True, tile_size=0, kmeans_niter=25, color_space=2)
