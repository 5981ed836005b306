"""Measure the PyTorch-CPU reference throughput for the north-star metric:
CDLNetVideo K=30 M=169 P=7 s=2, 16x128x128 gray clip @ sigma=25 (analyze3d
test loop, SURVEY.md 3.4)."""
import sys, time, types
import numpy as np, torch
sys.path.insert(0, "/root/reference")
tv = types.ModuleType("torchvision"); tft = types.ModuleType("torchvision.transforms")
tff = types.ModuleType("torchvision.transforms.functional"); tff.to_tensor = lambda x: torch.as_tensor(np.asarray(x))
tv.transforms = tft; tft.functional = tff
sys.modules.update({"torchvision": tv, "torchvision.transforms": tft, "torchvision.transforms.functional": tff})

from model.net import CDLNetVideo
torch.manual_seed(0)
torch.set_num_threads(torch.get_num_threads())
print("torch threads:", torch.get_num_threads())
net = CDLNetVideo(K=30, M=169, P=(7,7,7), s=2, C=1, adaptive=True, depth=16, init=False).eval()
x = torch.rand(1, 1, 16, 128, 128)
with torch.no_grad():
    t0 = time.time(); net(x, 25.0); warm = time.time() - t0
    print(f"warmup clip: {warm:.1f}s")
    n = max(1, int(30 // max(warm, 1)))
    t0 = time.time()
    for _ in range(n):
        net(x, 25.0)
    dt = (time.time() - t0) / n
print(f"torch-cpu: {dt:.2f}s/clip -> {16/dt:.3f} frames/sec  (n={n})")
