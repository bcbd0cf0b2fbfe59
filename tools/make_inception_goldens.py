"""Torch oracle for the Flax InceptionV3 port: an independent torch
implementation of the pytorch-FID Inception variant (architecture spec:
reference cleanfid/inception_pytorch.py:218-325 — FIDInceptionA/C/E pool
patches over the torchvision InceptionV3 graph), with parameter names
matching torchvision's so the weight converter consumes its state_dict.

The reference module itself cannot be imported in this environment (it
needs torchvision, absent) and real weights cannot be downloaded (zero
egress), so this re-implementation is the offline oracle for converter +
Flax-forward parity. tests/test_inception_parity.py builds it with seeded
RANDOM weights (+ randomized BN running stats) at test time — torch CPU
is always available — so no multi-MB golden blob is checked in, and the
first real-weights run is not the first test of the port.

Run as a script to dump a golden npz artifact instead:
  python tools/make_inception_goldens.py [out.npz]
"""

import os

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


class BasicConv2d(nn.Module):
  """conv(no bias) + BN(eps=0.001) + relu (torchvision BasicConv2d)."""

  def __init__(self, cin, cout, **kw):
    super().__init__()
    self.conv = nn.Conv2d(cin, cout, bias=False, **kw)
    self.bn = nn.BatchNorm2d(cout, eps=0.001)

  def forward(self, x):
    return F.relu(self.bn(self.conv(x)))


class InceptionA(nn.Module):

  def __init__(self, cin, pool_features):
    super().__init__()
    self.branch1x1 = BasicConv2d(cin, 64, kernel_size=1)
    self.branch5x5_1 = BasicConv2d(cin, 48, kernel_size=1)
    self.branch5x5_2 = BasicConv2d(48, 64, kernel_size=5, padding=2)
    self.branch3x3dbl_1 = BasicConv2d(cin, 64, kernel_size=1)
    self.branch3x3dbl_2 = BasicConv2d(64, 96, kernel_size=3, padding=1)
    self.branch3x3dbl_3 = BasicConv2d(96, 96, kernel_size=3, padding=1)
    self.branch_pool = BasicConv2d(cin, pool_features, kernel_size=1)

  def forward(self, x):
    b1 = self.branch1x1(x)
    b5 = self.branch5x5_2(self.branch5x5_1(x))
    bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
    # FID patch: TF avg pool excludes padded zeros (inception_pytorch.py:240)
    bp = F.avg_pool2d(x, 3, stride=1, padding=1, count_include_pad=False)
    bp = self.branch_pool(bp)
    return torch.cat([b1, b5, bd, bp], 1)


class InceptionB(nn.Module):

  def __init__(self, cin):
    super().__init__()
    self.branch3x3 = BasicConv2d(cin, 384, kernel_size=3, stride=2)
    self.branch3x3dbl_1 = BasicConv2d(cin, 64, kernel_size=1)
    self.branch3x3dbl_2 = BasicConv2d(64, 96, kernel_size=3, padding=1)
    self.branch3x3dbl_3 = BasicConv2d(96, 96, kernel_size=3, stride=2)

  def forward(self, x):
    b3 = self.branch3x3(x)
    bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
    bp = F.max_pool2d(x, 3, stride=2)
    return torch.cat([b3, bd, bp], 1)


class InceptionC(nn.Module):

  def __init__(self, cin, channels_7x7):
    super().__init__()
    c7 = channels_7x7
    self.branch1x1 = BasicConv2d(cin, 192, kernel_size=1)
    self.branch7x7_1 = BasicConv2d(cin, c7, kernel_size=1)
    self.branch7x7_2 = BasicConv2d(c7, c7, kernel_size=(1, 7),
                                   padding=(0, 3))
    self.branch7x7_3 = BasicConv2d(c7, 192, kernel_size=(7, 1),
                                   padding=(3, 0))
    self.branch7x7dbl_1 = BasicConv2d(cin, c7, kernel_size=1)
    self.branch7x7dbl_2 = BasicConv2d(c7, c7, kernel_size=(7, 1),
                                      padding=(3, 0))
    self.branch7x7dbl_3 = BasicConv2d(c7, c7, kernel_size=(1, 7),
                                      padding=(0, 3))
    self.branch7x7dbl_4 = BasicConv2d(c7, c7, kernel_size=(7, 1),
                                      padding=(3, 0))
    self.branch7x7dbl_5 = BasicConv2d(c7, 192, kernel_size=(1, 7),
                                      padding=(0, 3))
    self.branch_pool = BasicConv2d(cin, 192, kernel_size=1)

  def forward(self, x):
    b1 = self.branch1x1(x)
    b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
    bd = self.branch7x7dbl_1(x)
    bd = self.branch7x7dbl_3(self.branch7x7dbl_2(bd))
    bd = self.branch7x7dbl_5(self.branch7x7dbl_4(bd))
    bp = F.avg_pool2d(x, 3, stride=1, padding=1, count_include_pad=False)
    bp = self.branch_pool(bp)
    return torch.cat([b1, b7, bd, bp], 1)


class InceptionD(nn.Module):

  def __init__(self, cin):
    super().__init__()
    self.branch3x3_1 = BasicConv2d(cin, 192, kernel_size=1)
    self.branch3x3_2 = BasicConv2d(192, 320, kernel_size=3, stride=2)
    self.branch7x7x3_1 = BasicConv2d(cin, 192, kernel_size=1)
    self.branch7x7x3_2 = BasicConv2d(192, 192, kernel_size=(1, 7),
                                     padding=(0, 3))
    self.branch7x7x3_3 = BasicConv2d(192, 192, kernel_size=(7, 1),
                                     padding=(3, 0))
    self.branch7x7x3_4 = BasicConv2d(192, 192, kernel_size=3, stride=2)

  def forward(self, x):
    b3 = self.branch3x3_2(self.branch3x3_1(x))
    b7 = self.branch7x7x3_4(
        self.branch7x7x3_3(self.branch7x7x3_2(self.branch7x7x3_1(x))))
    bp = F.max_pool2d(x, 3, stride=2)
    return torch.cat([b3, b7, bp], 1)


class InceptionE(nn.Module):

  def __init__(self, cin, pool="avg"):
    super().__init__()
    self.pool = pool
    self.branch1x1 = BasicConv2d(cin, 320, kernel_size=1)
    self.branch3x3_1 = BasicConv2d(cin, 384, kernel_size=1)
    self.branch3x3_2a = BasicConv2d(384, 384, kernel_size=(1, 3),
                                    padding=(0, 1))
    self.branch3x3_2b = BasicConv2d(384, 384, kernel_size=(3, 1),
                                    padding=(1, 0))
    self.branch3x3dbl_1 = BasicConv2d(cin, 448, kernel_size=1)
    self.branch3x3dbl_2 = BasicConv2d(448, 384, kernel_size=3, padding=1)
    self.branch3x3dbl_3a = BasicConv2d(384, 384, kernel_size=(1, 3),
                                       padding=(0, 1))
    self.branch3x3dbl_3b = BasicConv2d(384, 384, kernel_size=(3, 1),
                                       padding=(1, 0))
    self.branch_pool = BasicConv2d(cin, 192, kernel_size=1)

  def forward(self, x):
    b1 = self.branch1x1(x)
    b3 = self.branch3x3_1(x)
    b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
    bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
    bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)], 1)
    if self.pool == "avg":  # Mixed_7b (FIDInceptionE_1)
      bp = F.avg_pool2d(x, 3, stride=1, padding=1, count_include_pad=False)
    else:  # Mixed_7c (FIDInceptionE_2): MAX pool (inception_pytorch.py:325)
      bp = F.max_pool2d(x, 3, stride=1, padding=1)
    bp = self.branch_pool(bp)
    return torch.cat([b1, b3, bd, bp], 1)


class FIDInceptionV3(nn.Module):
  """pytorch-FID fid_inception_v3 graph (num_classes=1008, no aux)."""

  def __init__(self, num_classes=1008):
    super().__init__()
    self.Conv2d_1a_3x3 = BasicConv2d(3, 32, kernel_size=3, stride=2)
    self.Conv2d_2a_3x3 = BasicConv2d(32, 32, kernel_size=3)
    self.Conv2d_2b_3x3 = BasicConv2d(32, 64, kernel_size=3, padding=1)
    self.Conv2d_3b_1x1 = BasicConv2d(64, 80, kernel_size=1)
    self.Conv2d_4a_3x3 = BasicConv2d(80, 192, kernel_size=3)
    self.Mixed_5b = InceptionA(192, 32)
    self.Mixed_5c = InceptionA(256, 64)
    self.Mixed_5d = InceptionA(288, 64)
    self.Mixed_6a = InceptionB(288)
    self.Mixed_6b = InceptionC(768, 128)
    self.Mixed_6c = InceptionC(768, 160)
    self.Mixed_6d = InceptionC(768, 160)
    self.Mixed_6e = InceptionC(768, 192)
    self.Mixed_7a = InceptionD(768)
    self.Mixed_7b = InceptionE(1280, "avg")
    self.Mixed_7c = InceptionE(2048, "max")
    self.fc = nn.Linear(2048, num_classes)

  def forward(self, x):
    x = self.Conv2d_1a_3x3(x)
    x = self.Conv2d_2a_3x3(x)
    x = self.Conv2d_2b_3x3(x)
    x = F.max_pool2d(x, 3, stride=2)
    x = self.Conv2d_3b_1x1(x)
    x = self.Conv2d_4a_3x3(x)
    x = F.max_pool2d(x, 3, stride=2)
    for name in ["Mixed_5b", "Mixed_5c", "Mixed_5d", "Mixed_6a", "Mixed_6b",
                 "Mixed_6c", "Mixed_6d", "Mixed_6e", "Mixed_7a", "Mixed_7b",
                 "Mixed_7c"]:
      x = getattr(self, name)(x)
    feats = x.mean(dim=(2, 3))  # adaptive avg pool to 1x1
    return feats, self.fc(feats)


def build_random_oracle(seed: int = 0) -> FIDInceptionV3:
  """Seeded random-weight oracle in eval mode. BN running stats are
  randomized too — fresh BN (mean 0, var 1) would mask converter bugs in
  the running-stat mapping."""
  torch.manual_seed(seed)
  model = FIDInceptionV3()
  with torch.no_grad():
    for name, buf in model.named_buffers():
      if name.endswith("running_mean"):
        buf.copy_(torch.randn_like(buf) * 0.2)
      elif name.endswith("running_var"):
        buf.copy_((torch.randn_like(buf) * 0.2).exp())
  return model.eval()


def oracle_forward(model: FIDInceptionV3, x_raw: np.ndarray):
  """x_raw: NCHW float in [0, 255] (the range the Flax port consumes);
  the torch graph gets the pytorch-FID normalization 2*(x/255)-1, which
  equals the port's x/127.5-1."""
  with torch.no_grad():
    feats, logits = model(torch.from_numpy(x_raw) / 127.5 - 1.0)
  return feats.numpy(), logits.numpy()


def main():
  import sys
  model = build_random_oracle()
  rng = np.random.RandomState(1)
  x_raw = rng.uniform(0, 255, size=(2, 3, 111, 111)).astype(np.float32)
  feats, logits = oracle_forward(model, x_raw)
  out = {"x_raw": x_raw, "feats": feats, "logits": logits}
  for key, tensor in model.state_dict().items():
    out["sd::" + key] = tensor.numpy()
  path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
      os.path.dirname(__file__), "inception_golden.npz")
  np.savez_compressed(path, **out)
  print(f"wrote {path}: feats {feats.shape}, logits {logits.shape}, "
        f"{len(out) - 3} state-dict tensors")


if __name__ == "__main__":
  main()
