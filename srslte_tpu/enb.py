"""eNB application: full-stack composition (srsenb/src/enb.cc equivalent).

Per-TTI loop over real PHY samples: DL subframes carry CRS/PSS/SSS, PBCH,
PCFICH, SIB1 (SI-RNTI), RAR (RA-RNTI), and per-UE PDCCH+PDSCH with MAC PDUs
muxed from SRB0 (RLC TM) / SRB1 (RLC AM + PDCP) / DRB1; UL subframes carry
PRACH (detected to RARs), PUCCH scheduling requests, and granted PUSCH
(msg3, RRC, NAS, user data).  The MME is attached by direct call (the
S1AP-lite boundary).

ALL grants flow through the MAC scheduler (mac/sched.py SchedDl + SchedUl —
sched_grid.cc:154 / mac.cc:598,610 analog): broadcast (SIB/RAR) through the
common-space DCI-1A allocator, UE data through the RBG-bitmap DCI-1
allocator with RLC-buffer-driven sizing, and UL through the BSR-driven
DCI-0 allocator.  UL demand reaches the scheduler the reference way:
PUCCH format-1 scheduling requests when the UE holds no grant, then BSR
control elements piggybacked on PUSCH.

Channel conventions shared with UeApp (both sides derive them from the cell
config, like the reference's sib/rr configs): CFI 2, PRACH in subframes with
tti % 10 == 1, msg3 grant fixed (carried in the RAR), SR opportunities at
tti % 10 == 3 on PUCCH resource n_pucch = ue_id.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .mac.pdu import DL_LCID, UL_LCID, MacPdu
from .mac.proc import bsr_bytes
from .mac.ra import EnbRach
from .mac.sched import SchedDl, SchedUl
from .pdcp import PdcpConfig, PdcpEntity
from .phy.common.params import Cell
from .phy.enb.enb_dl import EnbDl
from .phy.enb.enb_ul import EnbUl
from .phy.phch.dci import Dci0, Dci1A, pack_format0, pack_format1a
from .phy.phch.pbch import Mib
from .phy.phch.pdcch import Location, Pdcch, ue_locations
from .phy.phch.pdsch import Pdsch
from .phy.phch.prach import PrachConfig, prach_detect
from .phy.phch.pucch import Pucch, PucchConfig
from .phy.phch.pusch import Pusch
from .phy.phch.ra import DlGrant
from .phy.phch.ra_ul import UlGrant
from .rlc import RlcAm, RlcTm
from .rrc.messages import (ConnectionReconfiguration, ConnectionRequest,
                           ConnectionSetup, ConnectionSetupComplete,
                           DlInformationTransfer, RrcSecurityModeCommand,
                           RrcSecurityModeComplete, Sib1,
                           UlInformationTransfer,
                           ConnectionReconfigurationComplete,
                           rrc_pack, rrc_unpack)

SI_RNTI = 0xFFFF
RA_RNTI = 0x0002
CFI = 2
MSG3_GRANT = UlGrant(prb_start=1, n_prb=4, mcs=4)
SR_SF = 3  # SR opportunities at tti % 5 == 3, PUCCH f1 n_pucch = crnti % 12
SR_GRANT_BYTES = 64  # nominal demand an SR conveys until a BSR refines it


@dataclass
class EnbUe:
    crnti: int
    srb0: RlcTm = field(default_factory=RlcTm)
    srb1: RlcAm = field(default_factory=RlcAm)
    drb1: RlcAm = field(default_factory=RlcAm)
    pdcp1: PdcpEntity | None = None
    pdcp_drb: PdcpEntity | None = None
    rrc_state: str = "idle"
    ue_id: int = 0
    pending_ce: bytes | None = None  # contention-resolution CE for msg4
    rx_data: list = field(default_factory=list)  # deciphered DRB SDUs


class EnbApp:
    def __init__(self, cell: Cell, mme=None, mcs_dl: int = 5):
        self.cell = cell
        self.mme = mme
        self.mcs_dl = mcs_dl
        self.enb_dl = EnbDl(cell)
        self.enb_ul = EnbUl(cell)
        self.prach_cfg = PrachConfig(cell.ofdm, zero_corr_cfg=7)
        self.rach = EnbRach()
        self.sched_dl = SchedDl(cell, cfi=CFI)
        self.sched_ul = SchedUl(cell, cfi=CFI)
        self.ues: dict[int, EnbUe] = {}
        self.pending_rar: bytes | None = None
        self.ul_expect: dict[int, list] = {}  # tti -> [(crnti, grant, is_msg3)]
        self.sfn = 0
        self._next_ue_id = 1
        self._pending_nas: dict = {}

    # ---------------- DL ----------------------------------------------------
    def _dl_buffer_bytes(self, ue: EnbUe) -> int:
        """Pending DL bytes for the scheduler (RLC buffer state + CEs)."""
        n = sum(r.get_buffer_state()
                for r in (ue.srb0, ue.srb1, ue.drb1))
        if ue.pending_ce is not None:
            n += 7  # CE + subheader
        return n + (4 if n else 0)  # MAC subheader slack

    def tx_subframe(self, tti: int):
        import jax.numpy as jnp

        sf = tti % 10
        g = self.enb_dl.put_base(self.enb_dl.empty_grids(), sf)
        if sf == 0:
            g = self.enb_dl.put_pbch(g, Mib(self.cell.n_prb, "norm", "1",
                                            self.sfn))
        g = self.enb_dl.put_pcfich(g, sf, CFI)

        def put_dlsch(rnti, grant, loc, dci_bits, payload):
            nonlocal g
            pdsch = Pdsch(self.cell, grant, sf, cfi=CFI, rnti=rnti)
            tbs_bytes = grant.tbs // 8
            if isinstance(payload, MacPdu):
                # pad via an explicit padding subheader so the parser can
                # recover exact SDU lengths (36.321 §6.1.2)
                payload = payload.pack(pdu_len=tbs_bytes)
            if len(payload) > tbs_bytes:
                raise ValueError("DL payload exceeds TBS")
            raw = payload + bytes(tbs_bytes - len(payload))
            bits = np.unpackbits(np.frombuffer(raw, np.uint8))[: grant.tbs]
            g = self.enb_dl.put_pdcch(g, sf, CFI, dci_bits, rnti, loc)
            g = self.enb_dl.put_pdsch(g, pdsch, jnp.asarray(bits))

        # -- broadcast requests for this TTI (bc_sched/ra_sched analog) ------
        bc_requests = []
        bc_payloads = {}
        if self.pending_rar is not None:
            bc_requests.append((RA_RNTI, len(self.pending_rar), 0))
            bc_payloads[RA_RNTI] = self.pending_rar
        if tti % 40 == 5:  # SIB1 broadcast window
            sib = rrc_pack(Sib1())
            bc_requests.append((SI_RNTI, len(sib), 0))
            bc_payloads[SI_RNTI] = sib

        # -- DL buffer states into the scheduler -----------------------------
        for crnti, ue in self.ues.items():
            if crnti not in self.sched_dl.ues:
                self.sched_dl.add_ue(crnti)
            self.sched_dl.buffer_state(crnti, self._dl_buffer_bytes(ue))

        bc_allocs, dl_allocs = self.sched_dl.schedule_sf(tti, bc_requests)
        self.sched_dl.check_invariants(dl_allocs)

        for a in bc_allocs:
            put_dlsch(a.rnti, a.grant, a.loc,
                      pack_format1a(a.dci, self.cell.n_prb),
                      bc_payloads[a.rnti])
            if a.rnti == RA_RNTI:
                # msg3 PUSCH 4 TTIs out for the newest temp C-RNTI (grant
                # carried in the RAR payload)
                crnti = self.rach.next_crnti - 1
                self.ul_expect.setdefault(tti + 4, []).append(
                    (crnti, MSG3_GRANT, True))
                self.pending_rar = None

        # -- per-UE DL data: mux MAC PDUs to the scheduled TBS ---------------
        from .phy.phch.dci import pack_format1

        for a in dl_allocs:
            ue = self.ues[a.rnti]
            tbs_bytes = a.grant.tbs // 8
            pdu = MacPdu()
            n = 0
            if ue.pending_ce is not None:
                pdu.add_ce(int(DL_LCID.CON_RES_ID), ue.pending_ce)
                ue.pending_ce = None
                n += 1
            for lcid, rlc in ((0, ue.srb0), (1, ue.srb1), (3, ue.drb1)):
                if rlc.get_buffer_state() > 0:
                    sdu = rlc.read_pdu(tbs_bytes - 12)
                    if sdu:
                        pdu.add_sdu(lcid, sdu)
                        n += 1
            if not n:
                continue
            put_dlsch(a.rnti, a.grant, a.loc,
                      pack_format1(a.dci, self.cell.n_prb), pdu)

        # -- UL grants: BSR/SR-driven through SchedUl ------------------------
        used_cce = np.zeros(Pdcch(self.cell, CFI, sf).n_cce, bool)
        for a in bc_allocs + dl_allocs:
            used_cce[a.loc.cce : a.loc.cce + a.loc.L] = True
        for a in self.sched_ul.schedule(tti, used_cce=used_cce):
            dci0 = Dci0(rb_start=a.prb_start, l_crb=a.n_prb, mcs_rv=a.mcs)
            g = self.enb_dl.put_pdcch(g, sf, CFI,
                                      pack_format0(dci0, self.cell.n_prb),
                                      a.rnti, a.loc)
            self.ul_expect.setdefault(tti + 4, []).append(
                (a.rnti, UlGrant(a.prb_start, a.n_prb, a.mcs), False))

        if sf == 9:
            self.sfn = (self.sfn + 1) % 1024
        return self.enb_dl.gen_signal(g)[..., 0, :]

    # ---------------- UL ----------------------------------------------------
    def rx_subframe(self, samples, tti: int):
        """samples: PRACH window (tti%10==1), PUCCH/PUSCH subframe, or None."""
        if samples is None:
            self._tick()
            return
        expected = self.ul_expect.pop(tti, [])
        if tti % 10 == 1 and not expected:
            det, metric, toff = prach_detect(self.prach_cfg, samples)
            det = np.asarray(det)
            if det.any():
                idx = np.where(det)[0].tolist()
                tas = [int(np.asarray(toff)[i]) for i in idx]
                self.pending_rar = self.rach.rach_detected(idx, tas)
            self._tick()
            return
        for crnti, grant, is_msg3 in expected:
            pusch = Pusch(self.cell, grant, tti % 10, rnti=crnti)
            bits, ok, _ = self.enb_ul.decode_pusch(samples, pusch)
            if not bool(np.asarray(ok)):
                continue
            raw = np.packbits(np.asarray(bits)).tobytes()
            if is_msg3:
                self._handle_msg3(crnti, raw)
            else:
                self._handle_ul_mac(crnti, raw)
        if tti % 5 == SR_SF:
            # scheduling requests: PUCCH format 1 per connected UE (skip UEs
            # that transmitted PUSCH in this same subframe)
            served = {c for c, _, _ in expected}
            for crnti, ue in self.ues.items():
                if crnti in served or ue.rrc_state == "idle":
                    continue
                pucch = Pucch(self.cell,
                              PucchConfig("1", n_pucch=crnti % 12),
                              sf_idx=tti % 10)
                res = self.enb_ul.decode_pucch(samples, pucch)
                if bool(np.asarray(res["detected"])):
                    self.sched_ul.ul_bsr(
                        crnti, max(self.sched_ul.bsr.get(crnti, 0),
                                   SR_GRANT_BYTES))
        self._tick()

    def _tick(self):
        for ue in self.ues.values():
            ue.srb1.tick()
            ue.drb1.tick()

    # ---------------- stack ----------------------------------------------
    def _handle_msg3(self, crnti: int, raw: bytes):
        if self.rach.rx_msg3(crnti, raw) is None:
            return
        ue = EnbUe(crnti=crnti, ue_id=self._next_ue_id)
        self._next_ue_id += 1
        self.ues[crnti] = ue
        mac3 = MacPdu.parse(raw, ul=True)
        ccch = next(s for s in mac3.subpdus if s.lcid == int(UL_LCID.CCCH))
        req = rrc_unpack(ccch.payload, "ul_ccch")
        assert isinstance(req, ConnectionRequest)
        # msg4: contention-resolution CE (echo of the CCCH SDU head) +
        # ConnectionSetup on SRB0
        ue.pending_ce = ccch.payload[:6].ljust(6, b"\0")
        ue.srb0.write_sdu(rrc_pack(ConnectionSetup()))
        ue.rrc_state = "setup"

    def _handle_ul_mac(self, crnti: int, raw: bytes):
        ue = self.ues.get(crnti)
        if ue is None:
            return
        pdu = MacPdu.parse(raw, ul=True)
        for s in pdu.subpdus:
            if s.lcid == 1:
                ue.srb1.write_pdu(s.payload)
            elif s.lcid == 3:
                ue.drb1.write_pdu(s.payload)
            elif s.lcid in (int(UL_LCID.SHORT_BSR), int(UL_LCID.TRUNC_BSR)):
                idx = s.payload[0] & 0x3F
                self.sched_ul.ul_bsr(crnti, bsr_bytes(idx) if idx else 0)
        # drain SRB1 -> (PDCP) -> RRC
        for sdu in ue.srb1.rx_sdus[:]:
            ue.srb1.rx_sdus.remove(sdu)
            if ue.pdcp1 is not None:
                sdu = ue.pdcp1.rx(sdu)
                if sdu is None:
                    continue
            self._handle_rrc_ul(ue, sdu)
        # drain DRB1 -> PDCP decipher -> user plane
        for sdu in ue.drb1.rx_sdus[:]:
            ue.drb1.rx_sdus.remove(sdu)
            if ue.pdcp_drb is not None:
                pkt = ue.pdcp_drb.rx(sdu)
                if pkt is not None:
                    ue.rx_data.append(pkt)

    def send_data(self, crnti: int, packet: bytes):
        """Queue a DL user-plane packet (SGi -> DRB path)."""
        ue = self.ues[crnti]
        ue.drb1.write_sdu(ue.pdcp_drb.tx(packet))

    def _activate_as_security(self, ue: EnbUe):
        """AS keys from K_eNB (S1AP InitialContextSetup carries it in the
        reference; here it comes from the co-located MME)."""
        from .nas.keys import kdf_as_keys, kdf_kenb
        from .security import EEA2, EIA2

        kasme = self.mme.ues[ue.ue_id].kasme
        kenb = kdf_kenb(kasme, 0)
        k_up, k_rrc_int = kdf_as_keys(kenb, EEA2, EIA2)
        ue.pdcp1 = PdcpEntity(PdcpConfig(is_srb=True, bearer_id=1, ea=EEA2,
                                         ia=EIA2), kenb[:16], k_rrc_int,
                              is_ue=False)
        ue.pdcp_drb = PdcpEntity(PdcpConfig(is_srb=False, bearer_id=1,
                                            ea=EEA2), k_up, is_ue=False)

    def _handle_rrc_ul(self, ue: EnbUe, raw: bytes):
        msg = rrc_unpack(raw, "ul_dcch")
        if isinstance(msg, ConnectionSetupComplete):
            ue.rrc_state = "connected"
            self._nas_dl(ue, msg.nas_pdu)
        elif isinstance(msg, UlInformationTransfer):
            self._nas_dl(ue, msg.nas_pdu)
        elif isinstance(msg, RrcSecurityModeComplete):
            ue.rrc_state = "secure"
            self._activate_as_security(ue)
            ue.srb1.write_sdu(ue.pdcp1.tx(rrc_pack(ConnectionReconfiguration(
                drb_id=1, nas_pdu=self._pending_nas.pop(ue.crnti, b"")))))
        elif isinstance(msg, ConnectionReconfigurationComplete):
            ue.rrc_state = "rrc_reconfigured"

    def _nas_dl(self, ue: EnbUe, nas_pdu: bytes):
        if not nas_pdu or self.mme is None:
            return
        for dl in self.mme.rx_nas(ue.ue_id, nas_pdu):
            # when NAS reaches "attached", run RRC security then carry the
            # AttachAccept inside the ConnectionReconfiguration (as the
            # reference piggybacks it)
            ctx = self.mme.ues[ue.ue_id]
            if ctx.state == "attached" and ue.rrc_state == "connected":
                self._pending_nas[ue.crnti] = dl
                ue.srb1.write_sdu(rrc_pack(RrcSecurityModeCommand(
                    self.mme.ea, self.mme.ia)))
            else:
                ue.srb1.write_sdu(rrc_pack(DlInformationTransfer(nas_pdu=dl)))
